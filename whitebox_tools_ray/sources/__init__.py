"""Fixture generators and table readers (tiles, vector layers, DEM grids)."""
