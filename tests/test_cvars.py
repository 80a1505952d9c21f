"""CVar registry tests — the reference's console system (console/cvars.hpp)
as functional config/params edits."""

import numpy as np

from androidrenderer_tpu.app import cvars
from androidrenderer_tpu.config import GIMode, RenderConfig, RenderParams


def test_runtime_cvar_sets_param_without_recompile():
    cfg = RenderConfig()
    params = RenderParams.default()
    cfg2, params2, recompile = cvars.set_cvar("r.GI.LPV.Exposure", "42.5", cfg, params)
    assert not recompile and cfg2 is cfg
    assert float(params2.lpv_exposure) == 42.5
    assert float(params.lpv_exposure) != 42.5  # functional update


def test_structural_cvar_returns_new_config():
    cfg = RenderConfig()
    params = RenderParams.default()
    cfg2, params2, recompile = cvars.set_cvar("r.GI.Mode", "lpv", cfg, params)
    assert recompile and cfg2.gi_mode == GIMode.LPV and cfg.gi_mode == GIMode.OFF
    cfg3, _, _ = cvars.set_cvar("r.Shadow.CSM.CascadeResolution", "512", cfg2, params2)
    assert cfg3.shadow_cascade_resolution == 512


def test_listeners_fire_and_registry_lists():
    seen = []
    cvars.add_listener(lambda n, v: seen.append((n, v)))
    cfg, params = RenderConfig(), RenderParams.default()
    cvars.set_cvar("r.SSAO.Radius", "0.8", cfg, params)
    assert seen and seen[-1][0] == "r.SSAO.Radius"
    names = {d.name for d in cvars.list_cvars()}
    # The reference's headline cvars are all addressable.
    for n in ("r.GI.Mode", "r.AO", "r.AntiAliasing", "r.Shadow.SunShadowMode",
              "r.GI.LPV.Exposure", "r.GI.Cache.UpdatesPerFrame"):
        assert n in names


def test_get_cvar_roundtrip():
    cfg, params = RenderConfig(), RenderParams.default()
    cfg2, params2, _ = cvars.set_cvar("r.SSAO.Intensity", "1.5", cfg, params)
    assert float(cvars.get_cvar("r.SSAO.Intensity", cfg2, params2)) == 1.5
