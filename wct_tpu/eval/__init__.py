"""Fixed, evaluator-robust stylization-quality protocol (round 5).

Two independent legs, neither of which any trained bundle can game:

- ``eval.texture`` — pixel-space texture statistics (radial FFT
  spectrum, color quantile EMD, multi-scale local contrast), no
  learned components at all;
- ``eval.frozen`` — Gram/mean-std distances under a pinned-seed,
  never-trained CReLU-orthogonal evaluator encoder.

``scripts/eval_style_quality.py`` reports both (plus the legacy
learned-evaluator Gram numbers, clearly labelled as
evaluator-dependent); ``scripts/make_sample_grid.py`` renders the
committed per-round sample grids. Protocol rationale: DESIGN.md §4f.
"""

from wct_tpu.eval import frozen, texture  # noqa: F401

__all__ = ["texture", "frozen"]
