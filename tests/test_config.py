"""Env-var flag system (config.py) — the tfigrender_env_override.nim analog:
every runtime toggle parses its documented spellings, unknown values fall
back to defaults, and the renderer constructor honors the backend override.
Reference: figrender.nim:103-176, utils/glutils.nim:12-40.
"""

import pytest

from figdraw_tpu import config


@pytest.mark.parametrize("value,expect", [
    ("1", True), ("true", True), ("YES", True), ("on", True),
    ("0", False), ("false", False), ("", False), ("banana", False),
])
def test_truthy_spellings(monkeypatch, value, expect):
    monkeypatch.setenv("FIGDRAW_TEXT_SUBPIXEL_POSITIONING", value)
    assert config.runtime_text_subpixel_positioning_requested() is expect


def test_lcd_filtering_primary_name_wins_over_alt(monkeypatch):
    # the short alt spelling counts only when the primary is unset
    monkeypatch.delenv("FIGDRAW_TEXT_LCD_FILTERING", raising=False)
    monkeypatch.setenv("FIGDRAW_TEXT_LCD_FILTER", "1")
    assert config.runtime_text_lcd_filtering_requested()
    monkeypatch.setenv("FIGDRAW_TEXT_LCD_FILTERING", "0")
    assert not config.runtime_text_lcd_filtering_requested()


@pytest.mark.parametrize("backend,expect", [
    ("pallas", True), ("xla", False), ("ref", False), ("REFERENCE", False),
    ("", None), ("vulkan", None),
])
def test_backend_override_values(monkeypatch, backend, expect):
    monkeypatch.delenv("FIGDRAW_FORCE_XLA", raising=False)
    monkeypatch.setenv("FIGDRAW_BACKEND", backend)
    assert config.runtime_backend_override() is expect


def test_force_xla_flag(monkeypatch):
    monkeypatch.setenv("FIGDRAW_BACKEND", "")
    monkeypatch.setenv("FIGDRAW_FORCE_XLA", "1")
    assert config.runtime_backend_override() is False
    assert config.runtime_force_xla_requested()


def test_renderer_honors_backend_override(monkeypatch):
    """Env override applies when the constructor leaves use_pallas unset;
    an explicit argument wins (figrender.nim's constructor precedence)."""
    from figdraw_tpu.renderer import FigRenderer

    monkeypatch.setenv("FIGDRAW_BACKEND", "xla")
    assert FigRenderer(atlas_size=64).use_pallas is False
    monkeypatch.setenv("FIGDRAW_BACKEND", "pallas")
    assert FigRenderer(atlas_size=64).use_pallas is True
    assert FigRenderer(atlas_size=64, use_pallas=False).use_pallas is False


def test_atlas11_policy_parses(monkeypatch):
    monkeypatch.setenv("FIGDRAW_ATLAS11", "always")
    assert config.atlas11_policy() == "always"
    for junk in ("", "on", "1", "sometimes"):
        monkeypatch.setenv("FIGDRAW_ATLAS11", junk)
        assert config.atlas11_policy() == "off"


def test_batch_chunk_parses_and_clamps(monkeypatch):
    monkeypatch.setenv("FIGDRAW_BATCH_CHUNK", "4")
    assert config.batch_chunk() == 4
    monkeypatch.setenv("FIGDRAW_BATCH_CHUNK", "0")
    assert config.batch_chunk() == 1
    monkeypatch.setenv("FIGDRAW_BATCH_CHUNK", "not-a-number")
    assert config.batch_chunk() == 8
