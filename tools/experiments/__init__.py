"""Measured-negative raster kernel design studies (see conftest.py)."""
