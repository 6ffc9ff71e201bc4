"""Text subsystem: typefaces, shaping, glyph rasterization, text rendering."""
