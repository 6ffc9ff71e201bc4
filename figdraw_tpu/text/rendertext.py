"""Text node rendering: selection bands, decorations, per-glyph atlas quads.

Counterpart of renderText (/root/reference/src/figdraw/figrender.nim:417-497).
The glyph pipeline (typeset → raster → atlas) lands with the text subsystem;
until a node carries a text_layout produced by it, text nodes draw nothing —
matching the reference's behavior for an empty GlyphArrangement.
"""

from __future__ import annotations


def render_text_node(ctx, node) -> None:
    layout = node.text_layout
    if layout is None:
        return
    from .glyphs import draw_text_layout

    draw_text_layout(ctx, node, layout)
