"""CI coverage for scripts/verify_reference.py (the reference-arrival drill).

The drill must be KNOWN-WORKING the day `/root/reference/` populates
(VERDICT r1, next-round item 3), so its non-mount-dependent stages run
here: the empty-mount path, a synthetic populated mount that matches
SURVEY's reconstruction (→ PASS with artifact conversion), and a
deliberately divergent mount (→ FAIL), so both verdict directions are
exercised before the real reference ever lands.
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def drill():
    spec = importlib.util.spec_from_file_location(
        "verify_reference", REPO / "scripts" / "verify_reference.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["verify_reference"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_empty_mount_passes_with_skips(drill, tmp_path, capsys):
    rc = drill.main(["--reference", str(tmp_path / "nope"),
                     "--work-dir", str(tmp_path / "work")])
    out = capsys.readouterr().out
    assert rc == 0
    assert "selfcheck.constants" in out and "OK" in out
    assert "SKIP" in out


# Representative reference sources matching SURVEY's reconstruction —
# the happy path the drill must green-light.
_OPS_PY = """
import tensorflow as tf

def wct_tf(content, style, alpha=1, eps=1e-8):
    Dc = tf.boolean_mask(Sc, Sc > 1e-5)
    blended = alpha * fcs_hat + (1 - alpha) * fc
    return blended

def adain(content, style, epsilon=1e-5):
    pass
"""

_MODEL_PY = """
from keras.layers import Conv2D, UpSampling2D, MaxPooling2D

def build_decoder():
    x = UpSampling2D(2)(x)
    x = Conv2D(64, 3)(x)
    x = Conv2D(3, 3, name='decoder_relu1_1/out')(x)
"""

_STYLIZE_PY = """
parser.add_argument('--checkpoints', nargs='+')
parser.add_argument('--relu-targets', nargs='+')
parser.add_argument('--alpha', type=float, default=1)
parser.add_argument('--passes', type=int, default=1)
parser.add_argument('--adain', action='store_true')
parser.add_argument('--swap5', action='store_true')
parser.add_argument('--ss-alpha', type=float, default=0.6)
parser.add_argument('--keep-colors', action='store_true')
parser.add_argument('--concat', action='store_true')
parser.add_argument('--content-path')
parser.add_argument('--style-path')
parser.add_argument('--out-path')
parser.add_argument('--content-size', type=int)
parser.add_argument('--style-size', type=int)
parser.add_argument('--crop-size', type=int)
"""


def _populate(ref: Path, ops_py: str = _OPS_PY) -> None:
    ref.mkdir(parents=True)
    (ref / "ops.py").write_text(ops_py)
    (ref / "model.py").write_text(_MODEL_PY)
    (ref / "stylize.py").write_text(_STYLIZE_PY)
    (ref / "webcam.py").write_text("parser.add_argument('--interpolate')\n")
    (ref / "train.py").write_text("parser.add_argument('--relu-target')\n")
    (ref / "utils.py").write_text("# utils\n")
    (ref / "coral.py").write_text("# coral\n")
    (ref / "README.md").write_text("# WCT-TF\n")


def test_populated_mount_happy_path(drill, tmp_path, capsys, rng):
    ref = tmp_path / "reference"
    _populate(ref)
    # real artifact: a synthetic-but-wire-correct vgg_normalised.t7
    from test_tools import _fake_vgg_t7
    from wct_tpu.tools import t7_reader

    (ref / "models").mkdir()
    t7_reader.write_t7(str(ref / "models" / "vgg_normalised.t7"),
                       _fake_vgg_t7(rng))

    rc = drill.main(["--reference", str(ref),
                     "--work-dir", str(tmp_path / "work")])
    out = capsys.readouterr().out
    assert rc == 0, out
    for row in ("wct.eps", "wct.trunc", "flags.stylize.py", "artifacts.t7",
                "mount.layout"):
        line = next(ln for ln in out.splitlines()
                    if ln.startswith(f"[OK  ] {row}"))
        assert line, f"missing OK row {row}: {out}"
    # converted encoder npz exists and loads
    assert (tmp_path / "work" / "encoder.npz").exists()


def test_divergent_reference_fails(drill, tmp_path, capsys):
    ref = tmp_path / "reference"
    # eps and truncation differ from our constants → drill must FAIL
    _populate(ref, ops_py="""
def wct_tf(content, style, alpha=1, eps=1e-3):
    blended = alpha * fcs_hat + (1 - alpha) * fc
    return blended
""")
    rc = drill.main(["--reference", str(ref),
                     "--work-dir", str(tmp_path / "work")])
    out = capsys.readouterr().out
    assert rc == 1
    assert "[FAIL] wct.eps" in out
    assert "[FAIL] wct.trunc" in out


def test_missing_reference_flag_fails(drill, tmp_path, capsys):
    ref = tmp_path / "reference"
    _populate(ref)
    (ref / "stylize.py").write_text(
        _STYLIZE_PY + "parser.add_argument('--totally-new-flag')\n"
    )
    rc = drill.main(["--reference", str(ref),
                     "--work-dir", str(tmp_path / "work")])
    out = capsys.readouterr().out
    assert rc == 1
    assert "--totally-new-flag" in out
