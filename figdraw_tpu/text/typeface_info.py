"""Typeface metadata inspection.

Counterpart of /root/reference/src/figdraw/common/typefaceinfos.nim — the
pure SFNT metadata reader (name/cmap/GSUB/fvar): family + localized names,
codepoint coverage ranges with supports_codepoint, variable-font axes and
OpenType layout scripts/languages. fontTools does the table parsing the
reference hand-rolls.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

from .typefaces import TypefaceId, get_typeface


@dataclass
class VariationAxis:
    tag: str
    min_value: float
    default_value: float
    max_value: float
    name: str = ""


@dataclass
class TypefaceInfo:
    family: str = ""
    subfamily: str = ""
    full_name: str = ""
    postscript_name: str = ""
    localized_names: Dict[str, str] = field(default_factory=dict)
    coverage_ranges: List[Tuple[int, int]] = field(default_factory=list)
    glyph_count: int = 0
    units_per_em: int = 0
    variation_axes: List[VariationAxis] = field(default_factory=list)
    layout_scripts: List[str] = field(default_factory=list)
    layout_languages: List[str] = field(default_factory=list)

    def supports_codepoint(self, cp: int) -> bool:
        """Binary search over coverage ranges (typefaceinfos.nim:57-63)."""
        lo, hi = 0, len(self.coverage_ranges) - 1
        while lo <= hi:
            mid = (lo + hi) // 2
            start, end = self.coverage_ranges[mid]
            if cp < start:
                hi = mid - 1
            elif cp > end:
                lo = mid + 1
            else:
                return True
        return False


def _coverage_ranges(codepoints) -> List[Tuple[int, int]]:
    cps = sorted(codepoints)
    ranges: List[Tuple[int, int]] = []
    for cp in cps:
        if ranges and cp == ranges[-1][1] + 1:
            ranges[-1] = (ranges[-1][0], cp)
        else:
            ranges.append((cp, cp))
    return ranges


def get_typeface_info(typeface_id: TypefaceId) -> TypefaceInfo:
    tf = get_typeface(typeface_id)
    tt = tf._tt
    info = TypefaceInfo(
        family=tf.family_name,
        subfamily=tf.subfamily_name,
        units_per_em=tf.units_per_em,
        glyph_count=len(tf._glyph_order),
        coverage_ranges=_coverage_ranges(tf.cmap.keys()),
    )
    try:
        name = tt["name"]
        info.full_name = name.getDebugName(4) or ""
        info.postscript_name = name.getDebugName(6) or ""
        # BCP-47 language tags for localized family names (typefaceinfos.nim
        # localizedNames): Windows LCIDs / Mac language ids map through
        # fontTools' registry; unknown ids keep the numeric key
        from fontTools.ttLib.tables._n_a_m_e import (
            _MAC_LANGUAGES, _WINDOWS_LANGUAGES,
        )

        for rec in name.names:
            if rec.nameID == 1:
                try:
                    if rec.platformID == 3:
                        tag = _WINDOWS_LANGUAGES.get(rec.langID, str(rec.langID))
                    elif rec.platformID == 1:
                        tag = _MAC_LANGUAGES.get(rec.langID, str(rec.langID))
                    else:
                        tag = str(rec.langID)
                    info.localized_names[tag] = rec.toUnicode()
                except Exception:
                    pass
    except Exception:
        pass
    try:
        fvar = tt["fvar"]
        axis_names = {}
        for axis in fvar.axes:
            info.variation_axes.append(
                VariationAxis(
                    tag=axis.axisTag,
                    min_value=axis.minValue,
                    default_value=axis.defaultValue,
                    max_value=axis.maxValue,
                )
            )
    except Exception:
        pass
    for table_tag in ("GSUB", "GPOS"):
        try:
            table = tt[table_tag].table
            slist = table.ScriptList
            for rec in slist.ScriptRecord:
                if rec.ScriptTag not in info.layout_scripts:
                    info.layout_scripts.append(rec.ScriptTag)
                script = rec.Script
                for lrec in getattr(script, "LangSysRecord", []) or []:
                    if lrec.LangSysTag not in info.layout_languages:
                        info.layout_languages.append(lrec.LangSysTag)
        except Exception:
            continue
    return info
