#!/bin/bash
# One-shot A/B for the cascade-raster window height (config.shadow_win_h).
#
# Session-9 context: the parity trace puts CSM kernels at 13.1 ms/frame with
# cascade 1 alone at 8.1 (254k touches); cascade triangles are mostly far
# smaller than a 32-row window, so the win32 fold pays 32 sublane-rows of
# vector work per touch. win16 halves the per-touch fold at near-constant
# touch count IF the bboxes stay within one window — output is bit-identical
# either way (tests/test_shadow.py::test_bitmask_cascades_win_height_bit_identical).
#
# Could not be measured in session 9: single-kernel compiles exceeded 590 s
# (backend compile latency ~3-10x worse than sessions 5-7). Run on a QUIET
# machine when the backend recovers.
#
# DECISION: if bitmask16 (or 8) beats bitmask32 by > 10% on --mode csm, flip
# config.shadow_win_h to the winner (and consider win8 for the 128^2 RSM
# rasters in render/frame.py::_gi_raster, currently win16), rerun
# tests/test_shadow.py + one golden file, then bench.py; record in ROADMAP.
set -x
cd /root/repo
timeout 1200 python -u tools/bench_raster.py --mode csm --kernels bitmask32:4:2
timeout 1200 python -u tools/bench_raster.py --mode csm --kernels bitmask16:4:2
timeout 1200 python -u tools/bench_raster.py --mode csm --kernels bitmask8:4:2
timeout 1200 python -u tools/bench_raster.py --mode rsm --kernels bitmask16:4:2
timeout 1200 python -u tools/bench_raster.py --mode rsm --kernels bitmask8:4:2
