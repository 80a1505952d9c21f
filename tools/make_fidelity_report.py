"""Emit side-by-side production-vs-oracle renders + SSIM into docs/fidelity/.

    python tools/make_fidelity_report.py   (CPU, ~5 min)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from test_fidelity import CASCADES, H, SHADOW_RES, W, _fixture
    from reference_shade import shade_reference

    from androidrenderer_tpu.config import RenderConfig, RenderParams, ShadowMode
    from androidrenderer_tpu.render import initial_temporal_state, make_renderer
    from androidrenderer_tpu.utils.image import save_png, ssim

    out_dir = Path(__file__).resolve().parent.parent / "docs" / "fidelity"
    out_dir.mkdir(parents=True, exist_ok=True)
    lines = [
        "# Fidelity vs the independent oracle",
        "",
        "Production frames (left) vs `tests/reference_shade.py` (right) — a float64",
        "per-pixel numpy shader written from the reference's spec, sharing no code",
        "with the production ops. Gate: SSIM >= 0.98 (tests/test_fidelity.py).",
        "",
        "| fixture | production | oracle | SSIM |",
        "|---|---|---|---|",
    ]
    for name in ("cornell", "courtyard"):
        rs, view = _fixture(name)
        scene, _ = rs.build(with_bvh=False)
        cfg = RenderConfig(
            render_width=W, render_height=H, output_width=W, output_height=H,
            tile_height=32, tile_width=128, max_tris_per_tile=16384,
            shadow_mode=ShadowMode.CSM, num_shadow_cascades=CASCADES,
            shadow_cascade_resolution=SHADOW_RES, sky=False, bloom=False,
            occlusion_culling=False, alpha_masking=False, translucency=False,
        )
        out, _ = make_renderer(cfg)(
            scene, view, RenderParams.default(), initial_temporal_state(H, W)
        )
        produced = np.asarray(out.image)
        oracle = shade_reference(
            rs, view, W, H, np.asarray(out.csm.matrices, np.float64),
            np.asarray(out.csm.splits, np.float64), SHADOW_RES,
        )
        s = ssim(produced, oracle)
        save_png(str(out_dir / f"{name}_production.png"), produced)
        save_png(str(out_dir / f"{name}_oracle.png"), oracle)
        lines.append(
            f"| {name} | ![p]({name}_production.png) | ![o]({name}_oracle.png) "
            f"| {s:.4f} |"
        )
        print(f"{name}: SSIM {s:.4f}")
    (out_dir / "README.md").write_text("\n".join(lines) + "\n")
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
