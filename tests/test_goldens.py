"""Golden-image SSIM regression tests — the BASELINE.json fidelity harness
(SSIM >= 0.98), self-hosted: goldens are renders of the fixture scenes
(tools/make_goldens.py), guarding every refactor of the raster/shading stack."""

from pathlib import Path

import numpy as np
import pytest

from androidrenderer_tpu.utils.image import ssim

import tools_path  # noqa: F401  (adds repo root)

GOLDEN_DIR = Path(__file__).resolve().parent / "goldens"


def _load_png(path: Path) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


@pytest.mark.parametrize(
    "name",
    ["cornell_direct", "cornell_lpv", "courtyard_csm",
     "cornell_rtgi", "cornell_probes", "courtyard_vrsaa"],
)
def test_golden_ssim(name):
    golden_path = GOLDEN_DIR / f"{name}.png"
    if not golden_path.exists():
        pytest.skip("goldens not generated (tools/make_goldens.py)")
    import importlib

    mg = importlib.import_module("tools.make_goldens")
    img = mg.CASES[name]()
    golden = _load_png(golden_path)
    s = ssim(img, golden)
    assert s >= 0.98, f"{name}: SSIM {s:.4f} < 0.98"
