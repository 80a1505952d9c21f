"""Compute kernels (XLA + Pallas) — the TPU-native replacement for the reference's
SPIR-V shader library (RenderCore/shaders/, ~5.7k lines of Slang/GLSL)."""
