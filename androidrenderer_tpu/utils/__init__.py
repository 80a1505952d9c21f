"""Utilities: image IO, SSIM, profiling."""
