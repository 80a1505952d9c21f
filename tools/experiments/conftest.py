"""Measured-negative raster design studies (evicted from the production package
in round 5 — VERDICT r4 copy-paste findings): raster_touch (touch-expansion),
raster_lanes (8-touch sublane fold), raster_subfold (hybrid). Each lost its
A/B on TPU (numbers in docs/ROADMAP.md) but is kept runnable with tests:
``python -m pytest tools/experiments -q`` from the repo root."""

import os
import sys

_here = os.path.dirname(__file__)
_root = os.path.abspath(os.path.join(_here, "..", ".."))
for p in (_here, os.path.join(_root, "tests"), _root):
    if p not in sys.path:
        sys.path.insert(0, p)
