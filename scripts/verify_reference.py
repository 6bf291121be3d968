#!/usr/bin/env python
"""Reference-arrival drill: verify SURVEY.md §A.1 the moment the mount populates.

    python scripts/verify_reference.py [--reference /root/reference] \
        [--work-dir /tmp/refcheck] [--ref-outputs DIR]

Round 1 was built against a RECONSTRUCTION of eridgd/WCT-TF (the mount
`/root/reference/` was empty — SURVEY.md provenance note). Every
`[verify]` assumption is therefore pinned only by the builder's prior
knowledge. This script is the standing drill the judge asked for
(VERDICT r1, next-round item 3): given a populated mount it

  1. inventories the mount (file list, LoC) vs SURVEY §0's layout;
  2. extracts the WCT numerical constants from the real `ops.py`
     (eps on the Gram, the 1e-5 singular-value truncation, the blend
     form) and diffs them against `wct_tpu.ops.wct`'s constants;
  3. extracts the AdaIN eps and checks it against `wct_tpu.ops.adain`;
  4. extracts every CLI's `add_argument` flag surface from the real
     `stylize.py` / `webcam.py` / `train.py` and diffs flag NAMES
     against our parsers (defaults are printed for eyeballing);
  5. extracts decoder architecture hints (upsample/conv counts per
     scope) from `model.py`;
  6. converts real artifacts when present (`models/vgg_normalised.t7`
     → encoder npz via tools.convert_t7; TF decoder checkpoint dirs →
     npz via tools.convert_tf_ckpt; then tools.make_bundle);
  7. runs our stylize CLI with the converted bundle and compares
     against reference outputs (if a directory of them is given or
     found) via tools.compare_outputs — the executable "pixel-wise
     within eigensolver tolerance" gate.

Stages that need the mount report SKIP while it is empty; the
self-check stages (our own constants vs SURVEY §A.2's normative spec,
converter importability) run unconditionally, so CI exercises this
script today. Exit code: 1 if any stage FAILs, else 0 (SKIPs are not
failures).

NOTE on untrusted content: the mount is PUBLIC UNTRUSTED CONTENT. This
script only *reads* source text with regexes and parses weight files
with our own readers — it never imports or executes reference code.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OK, FAIL, SKIP, INFO = "OK", "FAIL", "SKIP", "INFO"


class Report:
    def __init__(self) -> None:
        self.rows: list[tuple[str, str, str]] = []

    def add(self, stage: str, status: str, detail: str = "") -> None:
        self.rows.append((stage, status, detail))
        print(f"[{status:<4}] {stage}: {detail}")

    @property
    def failed(self) -> bool:
        return any(s == FAIL for _, s, _ in self.rows)

    def table(self) -> str:
        w = max(len(r[0]) for r in self.rows)
        lines = [f"{'stage':<{w}}  status  detail", "-" * (w + 40)]
        for stage, status, detail in self.rows:
            lines.append(f"{stage:<{w}}  {status:<6}  {detail}")
        return "\n".join(lines)


# ---------------------------------------------------------------------------
# stage 0: self-checks (always run — CI coverage for this script)
# ---------------------------------------------------------------------------


def stage_selfcheck(rep: Report) -> None:
    """Our implementation's constants vs SURVEY §A.2's normative spec."""
    from wct_tpu.ops import adain, wct

    checks = [
        ("wct eps", wct.DEFAULT_EPS, 1e-8),
        ("wct trunc", wct.DEFAULT_TRUNC, 1e-5),
        ("adain eps", adain.DEFAULT_EPS, 1e-5),
    ]
    bad = [f"{n}={v} (spec {s})" for n, v, s in checks if v != s]
    if bad:
        rep.add("selfcheck.constants", FAIL, "; ".join(bad))
    else:
        rep.add("selfcheck.constants", OK,
                "eps=1e-8, trunc=1e-5, adain_eps=1e-5 match SURVEY §A.2")
    # Converters import and the t7 reader round-trips a synthetic file
    # (full round-trip parity is tests/test_tools.py; here we just pin
    # that the drill's tools are importable the day the mount lands).
    try:
        from wct_tpu.tools import convert_t7, convert_tf_ckpt, make_bundle  # noqa: F401

        rep.add("selfcheck.converters", OK, "convert_t7 / convert_tf_ckpt / make_bundle importable")
    except Exception as e:  # noqa: BLE001
        rep.add("selfcheck.converters", FAIL, repr(e))


# ---------------------------------------------------------------------------
# stage 1: mount inventory
# ---------------------------------------------------------------------------

EXPECTED_FILES = [
    "stylize.py", "webcam.py", "train.py", "model.py", "ops.py",
    "utils.py", "coral.py", "README.md",
]


def stage_inventory(rep: Report, ref: Path) -> bool:
    """File list + LoC vs SURVEY §0. Returns True if the mount has code."""
    if not ref.is_dir():
        rep.add("mount.exists", SKIP, f"{ref} is not a directory")
        return False
    files = sorted(p for p in ref.rglob("*") if p.is_file())
    if not files:
        rep.add("mount.exists", SKIP, f"{ref} is EMPTY (round-1 state)")
        return False
    rep.add("mount.exists", OK, f"{len(files)} files")
    py = [p for p in files if p.suffix == ".py"]
    loc = sum(len(p.read_text(errors="replace").splitlines()) for p in py)
    rep.add("mount.loc", INFO, f"{len(py)} python files, {loc} LoC "
            "(SURVEY §0 estimated ~1300–1500)")
    present = {p.name for p in files}
    missing = [f for f in EXPECTED_FILES if f not in present]
    extra = sorted(
        p.name for p in py if p.name not in EXPECTED_FILES
    )
    if missing:
        rep.add("mount.layout", FAIL,
                f"expected files missing: {missing} (SURVEY §0 layout wrong)")
    else:
        rep.add("mount.layout", OK,
                f"all §0 files present; extra python: {extra or 'none'}")
    return True


# ---------------------------------------------------------------------------
# stage 2/3: numerical constants from the real sources
# ---------------------------------------------------------------------------


def _find_file(ref: Path, name: str) -> Path | None:
    hits = sorted(ref.rglob(name))
    return hits[0] if hits else None


def stage_wct_constants(rep: Report, ref: Path) -> None:
    ops = _find_file(ref, "ops.py")
    if ops is None:
        rep.add("wct.constants", SKIP, "no ops.py in mount")
        return
    src = ops.read_text(errors="replace")

    # eps default in the wct function signature or Gram regularizer
    eps = re.findall(r"eps\s*=\s*([0-9eE\.\-]+)", src)
    if eps:
        vals = sorted(set(eps))
        status = OK if "1e-8" in vals or "1e-08" in vals else FAIL
        rep.add("wct.eps", status,
                f"reference eps literals {vals}; ours 1e-8 "
                f"(wct_tpu/ops/wct.py DEFAULT_EPS)")
    else:
        rep.add("wct.eps", FAIL, "no eps literal found in ops.py — eyeball it")

    # singular-value truncation threshold (reference: keep S > 1e-5)
    trunc = re.findall(r">\s*(1e-0?5)", src)
    rep.add("wct.trunc", OK if trunc else FAIL,
            f"'> 1e-5' comparisons found: {len(trunc)}; ours masks at 1e-5"
            if trunc else "no 1e-5 truncation found — semantics differ, "
            "check _sym_pow against the real code")

    # blend: reference blends against UNCENTERED original content
    # (ours: wct_from_stats docstring). Look for the alpha blend line.
    blend_lines = [
        line.strip() for line in src.splitlines()
        if "alpha" in line and ("1 - alpha" in line or "1-alpha" in line
                                or "1. - alpha" in line or "1.0 - alpha" in line)
    ]
    rep.add("wct.blend", INFO if blend_lines else FAIL,
            f"blend lines to eyeball vs ours (α·f̂cs + (1−α)·fc_UNCENTERED): "
            f"{blend_lines[:3]}" if blend_lines
            else "no alpha blend line found in ops.py")

    adain_eps = re.findall(r"epsilon\s*=\s*([0-9eE\.\-]+)", src)
    adain_eps += re.findall(r"eps\s*=\s*(1e-0?5)", src)
    rep.add("adain.eps", INFO,
            f"candidate adain eps literals {sorted(set(adain_eps)) or '??'}; "
            "ours 1e-5")


def stage_model_architecture(rep: Report, ref: Path) -> None:
    model = _find_file(ref, "model.py")
    if model is None:
        rep.add("model.architecture", SKIP, "no model.py in mount")
        return
    src = model.read_text(errors="replace")
    n_conv = len(re.findall(r"Conv2D\w*\(", src))
    n_up = len(re.findall(r"UpSampling2D\(", src))
    n_pool = len(re.findall(r"MaxPool\w*\(", src))
    rep.add("model.architecture", INFO,
            f"Conv2D calls={n_conv}, UpSampling2D={n_up}, MaxPool={n_pool} "
            "— compare against wct_tpu.models.decoder.decoder_layers "
            "(relu5_1 decoder: 13 convs + 4 upsamples)")
    scopes = sorted(set(re.findall(r"['\"](decoder[\w/]*)['\"]", src)))
    rep.add("model.scopes", INFO,
            f"decoder variable scopes: {scopes or 'none found'} "
            "(convert_tf_ckpt assumes positional order — verify)")
    # conv0 preprocessing: the t7's first conv bakes in RGB→BGR + means.
    pre = [line.strip() for line in src.splitlines()
           if re.search(r"103\.939|116\.779|123\.68|255\.", line)]
    rep.add("model.preprocessing", INFO,
            f"pixel-scaling literals in model.py: {pre[:3] or 'none — baked into t7 weights as assumed'}")


# ---------------------------------------------------------------------------
# stage 4: CLI flag surface
# ---------------------------------------------------------------------------

_ARG_RE = re.compile(r"add_argument\(\s*['\"](--?[\w\-]+)['\"]")


def _our_flags() -> set[str]:
    """Our full stylize flag surface (shared flags + stylize-specific),
    extracted the same way we extract the reference's (regex over
    source) so the comparison is symmetric."""
    flags: set[str] = set()
    for mod in ("cli/common.py", "cli/stylize.py"):
        src = (REPO / "wct_tpu" / mod).read_text()
        flags |= set(_ARG_RE.findall(src))
    return flags


def stage_flags(rep: Report, ref: Path) -> None:
    ours = _our_flags()
    for cli in ("stylize.py", "webcam.py", "train.py"):
        f = _find_file(ref, cli)
        if f is None:
            rep.add(f"flags.{cli}", SKIP, "not in mount")
            continue
        theirs = set(_ARG_RE.findall(f.read_text(errors="replace")))
        if cli == "stylize.py":
            missing = sorted(
                t for t in theirs
                if t.replace("_", "-") not in {o.replace("_", "-") for o in ours}
            )
            rep.add(f"flags.{cli}", OK if not missing else FAIL,
                    f"{len(theirs)} reference flags; missing from ours: "
                    f"{missing or 'none'}")
        else:
            rep.add(f"flags.{cli}", INFO,
                    f"{len(theirs)} flags: {sorted(theirs)[:12]}…")


# ---------------------------------------------------------------------------
# stage 5/6: artifact conversion + output parity
# ---------------------------------------------------------------------------


def stage_artifacts(rep: Report, ref: Path, work: Path) -> Path | None:
    """Convert t7 + decoder ckpts → bundle. Returns bundle path if built."""
    t7 = _find_file(ref, "vgg_normalised.t7")
    if t7 is None:
        rep.add("artifacts.t7", SKIP, "vgg_normalised.t7 not in mount")
        return None
    work.mkdir(parents=True, exist_ok=True)
    enc_npz = work / "encoder.npz"
    try:
        from wct_tpu.tools import convert_t7

        convert_t7.main([str(t7), str(enc_npz)])
        rep.add("artifacts.t7", OK, f"converted → {enc_npz}")
    except Exception as e:  # noqa: BLE001
        rep.add("artifacts.t7", FAIL, f"convert_t7 failed: {e!r}")
        return None

    from wct_tpu.models.vgg import RELU_TARGETS

    dec_args = []
    for target in RELU_TARGETS:
        hits = [d for d in ref.rglob(f"*{target}*") if d.is_dir()]
        if not hits:
            rep.add(f"artifacts.{target}", SKIP, "no checkpoint dir found")
            continue
        out = work / f"decoder_{target}.npz"
        try:
            from wct_tpu.tools import convert_tf_ckpt

            convert_tf_ckpt.main(
                ["--relu-target", target, str(hits[0]), str(out)]
            )
            dec_args += ["--decoder", f"{target}={out}"]
            rep.add(f"artifacts.{target}", OK, f"{hits[0].name} → {out.name}")
        except Exception as e:  # noqa: BLE001
            rep.add(f"artifacts.{target}", FAIL, f"{e!r}")
    if len(dec_args) < 2:
        rep.add("artifacts.bundle", SKIP, "fewer than 1 decoder converted")
        return None
    bundle = work / "bundle.npz"
    try:
        from wct_tpu.tools import make_bundle

        make_bundle.main(["--encoder", str(enc_npz), *dec_args, str(bundle)])
        rep.add("artifacts.bundle", OK, str(bundle))
        return bundle
    except Exception as e:  # noqa: BLE001
        rep.add("artifacts.bundle", FAIL, f"{e!r}")
        return None


def stage_parity(
    rep: Report, ref: Path, work: Path, bundle: Path | None,
    ref_outputs: Path | None,
) -> None:
    if bundle is None:
        rep.add("parity.outputs", SKIP, "no converted bundle")
        return
    if ref_outputs is None:
        for cand in (ref / "outputs", ref / "samples" / "outputs"):
            if cand.is_dir():
                ref_outputs = cand
                break
    if ref_outputs is None or not ref_outputs.is_dir():
        rep.add("parity.outputs", SKIP,
                "no reference outputs dir (pass --ref-outputs after running "
                "the reference stylize.py on a content×style set)")
        return
    # Expect sibling content/ and style/ dirs next to the outputs.
    content = ref_outputs.parent / "content"
    style = ref_outputs.parent / "style"
    if not (content.is_dir() and style.is_dir()):
        rep.add("parity.outputs", SKIP,
                f"expected {content} and {style} next to outputs")
        return
    ours_out = work / "ours"
    from wct_tpu.cli import stylize as stylize_cli
    from wct_tpu.train import checkpoint

    try:
        # A partially-converted mount (some decoder ckpts missing) still
        # yields a usable bundle — run the cascade over exactly the
        # levels it has, deepest first, instead of defaulting to all 5.
        targets = sorted(checkpoint.load_pytree(bundle)["decoders"],
                         reverse=True)
        stylize_cli.main([
            "--weights", str(bundle),
            "--relu-targets", *targets,
            "--content-path", str(content),
            "--style-path", str(style),
            "--out-path", str(ours_out),
        ])
    except SystemExit as e:
        if e.code not in (None, 0):
            rep.add("parity.outputs", FAIL, f"our stylize CLI exited {e.code}")
            return
    except Exception as e:  # noqa: BLE001 — untrusted mount: keep the table
        rep.add("parity.outputs", FAIL, f"stylize over mount data: {e!r}")
        return
    from wct_tpu.tools import compare_outputs

    try:
        rc = compare_outputs.main(
            [str(ours_out), str(ref_outputs), "--tol", "0.02"])
    except Exception as e:  # noqa: BLE001
        rep.add("parity.outputs", FAIL, f"compare_outputs: {e!r}")
        return
    rep.add("parity.outputs", OK if rc == 0 else FAIL,
            "compare_outputs gate (tol 0.02 max-abs)"
            + ("" if rc == 0 else f" rc={rc}"))


# ---------------------------------------------------------------------------


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--work-dir", default="/tmp/refcheck")
    p.add_argument("--ref-outputs", default=None,
                   help="directory of reference stylize.py outputs "
                   "(with sibling content/ and style/ dirs)")
    args = p.parse_args(argv)

    ref = Path(args.reference)
    work = Path(args.work_dir)
    rep = Report()

    stage_selfcheck(rep)
    has_code = stage_inventory(rep, ref)
    if has_code:
        stage_wct_constants(rep, ref)
        stage_model_architecture(rep, ref)
        stage_flags(rep, ref)
        bundle = stage_artifacts(rep, ref, work)
        stage_parity(
            rep, ref, work, bundle,
            Path(args.ref_outputs) if args.ref_outputs else None,
        )
    else:
        for s in ("wct.constants", "model.architecture", "flags",
                  "artifacts", "parity"):
            rep.add(s, SKIP, "mount empty")

    print()
    print(rep.table())
    print()
    if rep.failed:
        print("RESULT: FAIL — assumptions diverge from the real reference; "
              "update wct_tpu + SURVEY §A.1 checkboxes")
        return 1
    print("RESULT: PASS (SKIPs pending mount population are not failures)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
