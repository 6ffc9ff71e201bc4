"""Typeface registry + metadata at tfontutils depth: content-hash identity,
alias reuse, SFNT metadata (names, coverage, layout scripts, variable axes).

Ports of /root/reference/tests/tfontutils.nim:156-235 (registry identity) and
:167-219 (metadata parsing) against figdraw_tpu.text.typefaces /
typeface_info (typefaces.nim:186-298, typefaceinfos.nim).
"""

import shutil

import pytest

from figdraw_tpu.text.typeface_info import get_typeface_info
from figdraw_tpu.text.typefaces import FigFont, get_typeface, load_typeface

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
DEJAVU_SERIF = "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf"


def test_typeface_ids_reuse_identical_bytes_via_aliases(tmp_path):
    """tfontutils:235 — the id is a salted CONTENT hash: the same bytes
    loaded through different paths resolve to one typeface."""
    a = tmp_path / "alias_a.ttf"
    b = tmp_path / "alias_b.ttf"
    shutil.copy(DEJAVU, a)
    shutil.copy(DEJAVU, b)
    id_a = load_typeface(str(a))
    id_b = load_typeface(str(b))
    assert id_a == id_b
    assert id_a == load_typeface(DEJAVU)


def test_typeface_ids_distinguish_same_name_different_bytes(tmp_path):
    """tfontutils:224 — same file NAME, different bytes → different ids."""
    d1 = tmp_path / "one"
    d2 = tmp_path / "two"
    d1.mkdir()
    d2.mkdir()
    shutil.copy(DEJAVU, d1 / "font.ttf")
    shutil.copy(DEJAVU_SERIF, d2 / "font.ttf")
    assert load_typeface(str(d1 / "font.ttf")) != load_typeface(str(d2 / "font.ttf"))


def test_typeface_metadata_parsed(tmp_path):
    """tfontutils:167-201 — names, localized names with BCP-47 tags, layout
    scripts, codepoint coverage, and immutability of the cached info."""
    tid = load_typeface(DEJAVU)
    info = get_typeface_info(tid)
    assert info.family == "DejaVu Sans"
    assert info.subfamily == "Book"
    assert len(info.full_name) > 0
    assert len(info.postscript_name) > 0
    assert info.localized_names
    assert any(
        tag.startswith("en") for tag in info.localized_names
    ), info.localized_names
    assert "latn" in info.layout_scripts
    assert "arab" in info.layout_scripts
    assert info.supports_codepoint(ord("A"))
    # supportedCodepointCount('A'..'Z') == 26 (tfontutils:186)
    assert sum(
        1 for cp in range(ord("A"), ord("Z") + 1) if info.supports_codepoint(cp)
    ) == 26
    assert info.supports_codepoint(0x0627)  # alef (DejaVu covers Arabic)
    assert not info.supports_codepoint(0x10FFF0)

    # mutating a returned info must not poison the registry (tfontutils:195)
    info.layout_scripts[0] = "changed"
    info.coverage_ranges[0] = (999999, 999999)
    fresh = get_typeface_info(tid)
    assert "changed" not in fresh.layout_scripts
    assert fresh.supports_codepoint(ord("A"))


def test_typeface_metadata_variable_axes(tmp_path):
    """tfontutils:203-219 — fvar axes surface with tag/min/default/max."""
    from test_shaping import _build_var_font

    tid = load_typeface(_build_var_font(tmp_path))
    info = get_typeface_info(tid)
    axes = {a.tag: a for a in info.variation_axes}
    assert "wght" in axes
    assert (axes["wght"].min_value
            <= axes["wght"].default_value
            < axes["wght"].max_value)


def test_font_ids_ignore_shaping_only_settings():
    """tfontutils:280 — FontId keys the RASTER-relevant fields: two FigFonts
    differing only in shaping features share glyph-cache identity; size
    changes do not."""
    from figdraw_tpu.text.typefaces import FontFeature, register_font

    tid = load_typeface(DEJAVU)
    base = FigFont(typeface_id=tid, size=18.0)
    shaped = FigFont(typeface_id=tid, size=18.0,
                     features=(FontFeature("dlig", 1),))
    sized = FigFont(typeface_id=tid, size=19.0)
    assert register_font(base, 1.0) == register_font(shaped, 1.0)
    assert register_font(base, 1.0) != register_font(sized, 1.0)
    assert register_font(base, 1.0) != register_font(base, 2.0)  # uiScale
