// figdraw_tpu native typesetter: FDTP v3 font-pack engine.
//
// Re-applies the compiled OpenType plan serialized by
// figdraw_tpu/text/native_pack.py with semantics IDENTICAL to the Python
// shaper (figdraw_tpu/text/shaper.py — the clean-room counterpart of the
// reference's HarfBuzz binding, /root/reference/src/figdraw/textbackends/
// harfbuzzy.nim): lookup records apply in plan order; at each position a
// lookup's subtable entries are tried in order and the first match wins;
// LookupFlag skipping (GDEF classes, MarkFilteringSet, MarkAttachmentType)
// filters multi-glyph matching. v2 adds (chain-)contextual substitution and
// positioning (all three formats, with nested lookup application —
// shaper._try_entry_at's ctx branch), reverse-chain substitution, GPOS 3
// cursive chaining, GPOS 4/5/6 mark attachment (mark-to-base / ligature
// component / mark stacking — layout.py:667-752's attach loop), and the
// HarfBuzz Thai/Lao SARA AM preprocess. v3 adds the staged ARABIC pipeline
// (shaper._substitute_arabic): per-position joining analysis from the
// pack's Unicode joining classes, then HarfBuzz-style masked stages —
// ccmp+locl, isol/fina/medi/init (each applied only at tagged positions,
// tags surviving decomposition and ligation), rlig, and the remaining
// common features.
// tests/test_native_typeset.py pins this engine glyph-for-glyph against the
// Python pipeline.
//
// v4 adds the SYLLABLE pipelines (shaper._substitute_indic, text/use.py):
// Devanagari-class Indic (reph/rakar/half/conjunct stages, pre-base matra
// reordering), Khmer (coeng subscripts, pre-base coeng-ro, robat, cfar)
// and Myanmar (kinzi, medials) run natively from 21 per-stage plan arrays
// in the pack — FD_TYPESET_E_SCRIPT is no longer returned for any script
// the Python pipeline stages.
// v5 adds UAX#9 bidi to fd_typeset_box (levels + L1/L2 visual order + L4
// mirroring from the pack's class tables, text/bidi.py line-for-line).
// fd_typeset_shape (the offset-less advance-stream API) keeps refusing
// attach-capable marks with FD_TYPESET_E_MARKS; fd_typeset_shape_ex /
// fd_typeset_line / fd_typeset_box place marks via per-glyph offsets.

#include "figdraw_typeset.h"

#include <algorithm>
#include <array>
#include <cmath>
#include <cstring>
#include <string>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x46445450;  // 'FDTP'
constexpr uint32_t kVersion = 5;
constexpr uint8_t kMarkBit = 0x80;  // gdef byte: attach-capable mark
constexpr uint8_t kClassMask = 0x7F;

// entry kinds (native_pack.py)
constexpr uint32_t K_SINGLE = 1;
constexpr uint32_t K_MULTIPLE = 2;
constexpr uint32_t K_LIGA = 4;
constexpr uint32_t K_CTX1 = 5;
constexpr uint32_t K_CTX2 = 6;
constexpr uint32_t K_CTX3 = 7;
constexpr uint32_t K_RCHAIN = 8;
constexpr uint32_t K_POS1 = 17;
constexpr uint32_t K_POS2S = 18;
constexpr uint32_t K_POS2C = 19;

struct SingleRow {
  uint16_t from, to;
};
struct Pos1Row {
  uint16_t gid;
  int16_t dx;
};
struct Pos2sRow {
  uint16_t g1, g2;
  int16_t v1, v2;
};
struct LigaCand {
  std::vector<uint16_t> rest;  // components after the first
  uint16_t result;
};
struct Pos2cTable {
  std::vector<uint16_t> cov;                    // sorted coverage gids
  std::vector<std::pair<uint16_t, uint16_t>> cd1, cd2;  // sorted (gid, class)
  uint32_t c1 = 0, c2 = 0;
  std::vector<std::pair<int16_t, int16_t>> mat;  // c1*c2 (v1, v2)
};

// one (chain) context rule: values are gids (fmt 1) or class ids (fmt 2);
// the input sequence EXCLUDES the first (coverage) glyph, exactly like the
// shaper's compiled rules
struct CtxRule {
  std::vector<uint16_t> bt, inp, la;
  std::vector<std::pair<uint16_t, uint16_t>> recs;  // (seq_idx, pack lookup)
};
struct Ctx1Table {
  std::unordered_map<uint16_t, std::vector<CtxRule>> rules;  // first gid
};
struct Ctx2Table {
  std::vector<uint16_t> cov;  // sorted
  std::vector<std::pair<uint16_t, uint16_t>> in_cd, bt_cd, la_cd;  // sorted
  std::unordered_map<uint16_t, std::vector<CtxRule>> rules;  // input class
};
struct Ctx3Table {
  std::vector<std::vector<uint16_t>> bt, inp, la;  // sorted coverage sets
  std::vector<std::pair<uint16_t, uint16_t>> recs;
};
struct RchainTable {
  std::vector<SingleRow> map;  // sorted by from
  std::vector<std::vector<uint16_t>> bt, la;  // sorted coverage sets
};

struct Entry {
  uint32_t kind = 0;
  std::vector<SingleRow> single;  // sorted by from
  std::unordered_map<uint16_t, std::vector<uint16_t>> multiple;
  std::unordered_map<uint16_t, std::vector<LigaCand>> liga;  // emit order kept
  Ctx1Table ctx1;
  Ctx2Table ctx2;
  Ctx3Table ctx3;
  RchainTable rchain;
  std::vector<Pos1Row> pos1;    // sorted by gid
  std::vector<Pos2sRow> pos2s;  // sorted by (g1, g2)
  Pos2cTable pos2c;
};

struct Lookup {
  uint32_t skip_classes = 0;  // bit k set = GDEF class k skipped
  uint32_t attach_class = 0;  // MarkAttachmentType filter (0 = none)
  bool has_filter = false;    // UseMarkFilteringSet present
  std::vector<uint16_t> filter;  // sorted member gids
  std::vector<Entry> entries;
};

struct KernRow {
  uint16_t left, right;
  int16_t value;
};

// GPOS 3 cursive: entry/exit anchors per glyph
struct CursRow {
  uint8_t flags = 0;  // 1 = has entry, 2 = has exit
  int16_t ex = 0, ey = 0, xx = 0, xy = 0;
};
// GPOS 4/5/6 mark record: attachment class + the mark's own anchor
struct MarkRec {
  uint16_t cls = 0;
  int16_t mx = 0, my = 0;
};
using AnchorSet = std::unordered_map<uint16_t, std::pair<int16_t, int16_t>>;
struct MarkBaseTable {
  std::unordered_map<uint16_t, MarkRec> marks;
  std::unordered_map<uint16_t, AnchorSet> bases;  // also mark2 of mkmk
};
struct MarkLigTable {
  std::unordered_map<uint16_t, MarkRec> marks;
  std::unordered_map<uint16_t, std::vector<AnchorSet>> ligs;  // per component
};

}  // namespace

struct FdFontPack {
  float upem = 0, ascent = 0, descent = 0, line_gap = 0;
  uint32_t flags = 0;
  uint32_t n_glyphs = 0;
  bool allow_reduced = false;  // fd_pack_set_allow_reduced (runtime opt-in)
  std::vector<std::pair<uint32_t, uint32_t>> cmap;  // sorted by codepoint
  std::vector<float> advances;
  std::vector<uint8_t> gdef;     // low 7 bits class, bit 7 mark
  std::vector<uint8_t> mattach;  // MarkAttachClassDef class
  std::vector<Lookup> gsub, gpos;           // ALL lookups (plan + nested)
  std::vector<uint32_t> sub_plan, pos_plan;  // pack-local plan order
  std::vector<KernRow> kern0;  // sorted by (left, right)
  std::vector<std::unordered_map<uint16_t, CursRow>> cursive;
  std::vector<MarkBaseTable> mark_base;
  std::vector<MarkLigTable> mark_lig;
  std::vector<MarkBaseTable> mark_mark;  // marks=marks1, bases=mark2 anchors
  // v3 staged Arabic: joining classes (0=U 1=R 2=D 3=T) for U+0600..U+06FF
  // then U+0750..U+077F, and the 7 stage plans in _substitute_arabic order
  // (ccmp+locl, isol, fina, medi, init, rlig, rest)
  uint8_t arab_join[304] = {0};
  std::vector<uint32_t> arab_plans[7];
  // v4 syllable pipelines: 21 stage plans in V4_STAGE_FEATURES order
  // (9 Indic: locl+nukt+akhn, rphf, rkrf, pref, blwf, half, pstf,
  // vatu+cjct, presentation; 6 Khmer: locl+ccmp, pref, blwf, abvf, pstf,
  // cfar; 5 Myanmar: locl+ccmp, rphf, pref, blwf, pstf; 1 USE pres)
  std::vector<uint32_t> syl_plans[21];
  // v5 bidi: RLE class table (start, end, class code in BIDI_CLASSES
  // order) + mirrored-property ranges — serialized from the builder's
  // unicodedata so the C UAX#9 pass matches text/bidi.py exactly
  struct BidiRange {
    uint32_t start, end, cls;
  };
  std::vector<BidiRange> bidi_cls;                       // sorted by start
  std::vector<std::pair<uint32_t, uint32_t>> mirrored;   // sorted by start
};

// syl_plans index bases
constexpr int SP_INDIC = 0, SP_KHMER = 9, SP_MYANMAR = 15, SP_USE_PRES = 20;

namespace {

// ---- blob reader ------------------------------------------------------------

struct Reader {
  const uint8_t *p, *end;
  bool ok = true;
  bool need(size_t n) {
    if (!ok || (size_t)(end - p) < n) {
      ok = false;
      return false;
    }
    return true;
  }
  // bound a COUNT against the remaining bytes BEFORE resize/reserve: a
  // malformed blob with a huge count must fail the parse (NULL from
  // fd_pack_load), not throw std::bad_alloc out of a multi-GB allocation
  bool can(uint64_t count, size_t elem_size) {
    if (!ok || count > (uint64_t)(end - p) / elem_size) {
      ok = false;
      return false;
    }
    return true;
  }
  uint32_t u32() {
    if (!need(4)) return 0;
    uint32_t v;
    std::memcpy(&v, p, 4);
    p += 4;
    return v;
  }
  float f32() {
    if (!need(4)) return 0;
    float v;
    std::memcpy(&v, p, 4);
    p += 4;
    return v;
  }
  uint16_t u16() {
    if (!need(2)) return 0;
    uint16_t v;
    std::memcpy(&v, p, 2);
    p += 2;
    return v;
  }
  int16_t i16() { return (int16_t)u16(); }
  void align4(const uint8_t *base) {
    size_t off = (size_t)(p - base);
    size_t pad = (4 - (off & 3)) & 3;
    if (need(pad)) p += pad;
  }
};

bool parse_rule(Reader &r, CtxRule &rule) {
  uint16_t n_bt = r.u16(), n_inp = r.u16(), n_la = r.u16(), n_rec = r.u16();
  if (!r.can((uint64_t)n_bt + n_inp + n_la, 2) || !r.can(n_rec, 4))
    return false;
  rule.bt.resize(n_bt);
  for (uint16_t k = 0; k < n_bt; k++) rule.bt[k] = r.u16();
  rule.inp.resize(n_inp);
  for (uint16_t k = 0; k < n_inp; k++) rule.inp[k] = r.u16();
  rule.la.resize(n_la);
  for (uint16_t k = 0; k < n_la; k++) rule.la[k] = r.u16();
  rule.recs.resize(n_rec);
  for (uint16_t k = 0; k < n_rec; k++) {
    rule.recs[k].first = r.u16();
    rule.recs[k].second = r.u16();
  }
  return r.ok;
}

bool parse_cov(Reader &r, std::vector<uint16_t> &cov) {
  uint16_t n = r.u16();
  if (!r.can(n, 2)) return false;
  cov.resize(n);
  for (uint16_t k = 0; k < n; k++) cov[k] = r.u16();
  return r.ok;
}

bool parse_entry(Reader &r, const uint8_t *base, Entry &e) {
  e.kind = r.u32();
  uint32_t count = r.u32();
  switch (e.kind) {
    case K_SINGLE:
      if (!r.can(count, 4)) return false;
      e.single.reserve(count);
      for (uint32_t k = 0; k < count && r.ok; k++) {
        SingleRow row;
        row.from = r.u16();
        row.to = r.u16();
        e.single.push_back(row);
      }
      break;
    case K_MULTIPLE:
      for (uint32_t k = 0; k < count && r.ok; k++) {
        uint16_t from = r.u16();
        uint16_t seq_n = r.u16();
        std::vector<uint16_t> seq(seq_n);
        for (uint16_t q = 0; q < seq_n; q++) seq[q] = r.u16();
        e.multiple.emplace(from, std::move(seq));
      }
      break;
    case K_LIGA:
      for (uint32_t k = 0; k < count && r.ok; k++) {
        uint16_t first = r.u16();
        uint16_t rest_n = r.u16();
        LigaCand cand;
        cand.result = r.u16();
        cand.rest.resize(rest_n);
        for (uint16_t q = 0; q < rest_n; q++) cand.rest[q] = r.u16();
        e.liga[first].push_back(std::move(cand));  // emit order preserved
      }
      break;
    case K_CTX1: {
      uint32_t n_first = r.u32();
      if (!r.can(n_first, 4)) return false;
      for (uint32_t k = 0; k < n_first && r.ok; k++) {
        uint16_t first = r.u16();
        uint16_t n_rules = r.u16();
        auto &rules = e.ctx1.rules[first];
        rules.resize(n_rules);
        for (uint16_t q = 0; q < n_rules; q++)
          if (!parse_rule(r, rules[q])) return false;
      }
      break;
    }
    case K_CTX2: {
      Ctx2Table &t = e.ctx2;
      uint32_t n_cov = r.u32(), n_in = r.u32(), n_bt = r.u32(),
               n_la = r.u32(), n_sets = r.u32();
      if (!r.can(n_cov, 2) ||
          !r.can((uint64_t)n_in + n_bt + n_la, 4) || !r.can(n_sets, 4))
        return false;
      t.cov.resize(n_cov);
      for (uint32_t k = 0; k < n_cov; k++) t.cov[k] = r.u16();
      t.in_cd.resize(n_in);
      for (uint32_t k = 0; k < n_in; k++) {
        t.in_cd[k].first = r.u16();
        t.in_cd[k].second = r.u16();
      }
      t.bt_cd.resize(n_bt);
      for (uint32_t k = 0; k < n_bt; k++) {
        t.bt_cd[k].first = r.u16();
        t.bt_cd[k].second = r.u16();
      }
      t.la_cd.resize(n_la);
      for (uint32_t k = 0; k < n_la; k++) {
        t.la_cd[k].first = r.u16();
        t.la_cd[k].second = r.u16();
      }
      for (uint32_t k = 0; k < n_sets && r.ok; k++) {
        uint16_t ci = r.u16();
        uint16_t n_rules = r.u16();
        auto &rules = t.rules[ci];
        rules.resize(n_rules);
        for (uint16_t q = 0; q < n_rules; q++)
          if (!parse_rule(r, rules[q])) return false;
      }
      break;
    }
    case K_CTX3: {
      Ctx3Table &t = e.ctx3;
      uint32_t n_bt = r.u32(), n_inp = r.u32(), n_la = r.u32(),
               n_rec = r.u32();
      if (!r.can((uint64_t)n_bt + n_inp + n_la, 2) || !r.can(n_rec, 4))
        return false;
      t.bt.resize(n_bt);
      for (uint32_t k = 0; k < n_bt; k++)
        if (!parse_cov(r, t.bt[k])) return false;
      t.inp.resize(n_inp);
      for (uint32_t k = 0; k < n_inp; k++)
        if (!parse_cov(r, t.inp[k])) return false;
      t.la.resize(n_la);
      for (uint32_t k = 0; k < n_la; k++)
        if (!parse_cov(r, t.la[k])) return false;
      t.recs.resize(n_rec);
      for (uint32_t k = 0; k < n_rec; k++) {
        t.recs[k].first = r.u16();
        t.recs[k].second = r.u16();
      }
      break;
    }
    case K_RCHAIN: {
      RchainTable &t = e.rchain;
      uint32_t n_map = r.u32(), n_bt = r.u32(), n_la = r.u32();
      if (!r.can(n_map, 4) || !r.can((uint64_t)n_bt + n_la, 2))
        return false;
      t.map.resize(n_map);
      for (uint32_t k = 0; k < n_map; k++) {
        t.map[k].from = r.u16();
        t.map[k].to = r.u16();
      }
      t.bt.resize(n_bt);
      for (uint32_t k = 0; k < n_bt; k++)
        if (!parse_cov(r, t.bt[k])) return false;
      t.la.resize(n_la);
      for (uint32_t k = 0; k < n_la; k++)
        if (!parse_cov(r, t.la[k])) return false;
      break;
    }
    case K_POS1:
      if (!r.can(count, 4)) return false;
      e.pos1.reserve(count);
      for (uint32_t k = 0; k < count && r.ok; k++) {
        Pos1Row row;
        row.gid = r.u16();
        row.dx = r.i16();
        e.pos1.push_back(row);
      }
      break;
    case K_POS2S:
      if (!r.can(count, 8)) return false;
      e.pos2s.reserve(count);
      for (uint32_t k = 0; k < count && r.ok; k++) {
        Pos2sRow row;
        row.g1 = r.u16();
        row.g2 = r.u16();
        row.v1 = r.i16();
        row.v2 = r.i16();
        e.pos2s.push_back(row);
      }
      break;
    case K_POS2C: {
      Pos2cTable &t = e.pos2c;
      uint32_t n_cov = r.u32(), n_cd1 = r.u32(), n_cd2 = r.u32();
      t.c1 = r.u32();
      t.c2 = r.u32();
      if (!r.can(n_cov, 2) || !r.can(n_cd1, 4) || !r.can(n_cd2, 4))
        return false;
      t.cov.resize(n_cov);
      for (uint32_t k = 0; k < n_cov; k++) t.cov[k] = r.u16();
      r.align4(base);
      t.cd1.resize(n_cd1);
      for (uint32_t k = 0; k < n_cd1; k++) {
        t.cd1[k].first = r.u16();
        t.cd1[k].second = r.u16();
      }
      t.cd2.resize(n_cd2);
      for (uint32_t k = 0; k < n_cd2; k++) {
        t.cd2[k].first = r.u16();
        t.cd2[k].second = r.u16();
      }
      if (t.c1 && t.c2 > (1u << 24) / t.c1) return false;  // size guard
      if (!r.can((uint64_t)t.c1 * t.c2, 4)) return false;
      t.mat.resize((size_t)t.c1 * t.c2);
      for (auto &mv : t.mat) {
        mv.first = r.i16();
        mv.second = r.i16();
      }
      break;
    }
    default:
      return false;  // unknown entry kind: blob from a newer exporter
  }
  r.align4(base);
  return r.ok;
}

bool parse_lookup(Reader &r, const uint8_t *base, Lookup &L) {
  L.skip_classes = r.u32();
  L.attach_class = r.u32();
  uint32_t filter_state = r.u32();  // 0 none, 1 empty set, 2 present
  uint32_t filter_n = r.u32();
  L.has_filter = filter_state != 0;
  if (!r.can(filter_n, 2)) return false;
  L.filter.resize(filter_n);
  for (uint32_t k = 0; k < filter_n; k++) L.filter[k] = r.u16();
  r.align4(base);
  uint32_t n_entries = r.u32();
  if (n_entries > (1u << 20)) return false;
  L.entries.resize(n_entries);
  for (uint32_t k = 0; k < n_entries && r.ok; k++)
    if (!parse_entry(r, base, L.entries[k])) return false;
  return r.ok;
}

// ---- skip state (shaper._skipped) -------------------------------------------

inline bool sorted_contains(const std::vector<uint16_t> &v, uint16_t g) {
  size_t lo = 0, hi = v.size();
  while (lo < hi) {
    size_t mid = (lo + hi) / 2;
    if (v[mid] < g)
      lo = mid + 1;
    else
      hi = mid;
  }
  return lo < v.size() && v[lo] == g;
}

inline int cls_of(const std::vector<std::pair<uint16_t, uint16_t>> &cd,
                  uint16_t g) {
  size_t lo = 0, hi = cd.size();
  while (lo < hi) {
    size_t mid = (lo + hi) / 2;
    if (cd[mid].first < g)
      lo = mid + 1;
    else
      hi = mid;
  }
  return (lo < cd.size() && cd[lo].first == g) ? cd[lo].second : 0;
}

inline bool skipped(const FdFontPack *pk, const Lookup &L, uint16_t g) {
  uint8_t cls = (g < pk->gdef.size() ? pk->gdef[g] : 0) & kClassMask;
  if (cls && (L.skip_classes >> cls) & 1) return true;
  if (cls == 3) {
    if (L.has_filter) return !sorted_contains(L.filter, g);
    if (L.attach_class) {
      uint8_t mac = g < pk->mattach.size() ? pk->mattach[g] : 0;
      return mac != L.attach_class;
    }
  }
  return false;
}

inline size_t next_pos(const FdFontPack *pk, const Lookup &L,
                       const std::vector<uint16_t> &g, size_t j) {
  while (j < g.size() && skipped(pk, L, g[j])) j++;
  return j;
}

inline long prev_pos(const FdFontPack *pk, const Lookup &L,
                     const std::vector<uint16_t> &g, long j) {
  while (j >= 0 && skipped(pk, L, g[(size_t)j])) j--;
  return j;
}

// per-glyph (lig_size, attach_comp) — shaper.substitute_ex's third list:
// lig_size > 1 marks a ligature of that many components; attach_comp >= 0
// tags a skipped mark with the 0-based component it logically follows
using Comps = std::vector<std::pair<uint16_t, int16_t>>;

// ---- HarfBuzz-style stage masks (shaper._mask_ok) -----------------------------
//
// The staged pipelines tag each position with the positional features it
// may participate in (bit per tag; 0 = none, the Python pipeline's None).
// A masked stage (`req` != 0) only matches input glyphs carrying the bit —
// a mismatching glyph FAILS the match, it is not skipped. Unmasked stages
// (req == 0) ignore masks but still thread them through substitutions so
// tags survive decomposition and ligation.
using Masks = std::vector<uint16_t>;
// Arabic positional tags
constexpr uint16_t M_ISOL = 1, M_FINA = 2, M_MEDI = 4, M_INIT = 8;
// Indic / Khmer / Myanmar positional tags (indic.build_masks,
// use.khmer_masks / myanmar_masks)
constexpr uint16_t M_RPHF = 16, M_HALF = 32, M_BLWF = 64, M_PREF = 128,
                   M_PSTF = 256, M_ABVF = 512, M_CFAR = 1024;

inline bool mask_ok(const Masks *mk, uint16_t req, size_t pos) {
  if (!req || mk == nullptr) return true;
  return pos < mk->size() && ((*mk)[pos] & req) != 0;
}

// ---- (chain) context matching (shaper._match_ctx) ----------------------------

// Matches backtrack / input-rest / lookahead around position i with flag
// skipping; value checks go through the per-sequence callables (glyph /
// class / coverage formats). Fills input_pos (starting with i).
template <typename BtF, typename InF, typename LaF>
bool match_ctx(const FdFontPack *pk, const Lookup &L,
               const std::vector<uint16_t> &g, size_t i, size_t n_bt,
               size_t n_inp, size_t n_la, BtF btv, InF inv, LaF lav,
               std::vector<size_t> &input_pos, const Masks *mk = nullptr,
               uint16_t req = 0) {
  long j = (long)i;
  for (size_t k = 0; k < n_bt; k++) {  // closest-first order
    j = prev_pos(pk, L, g, j - 1);
    if (j < 0 || !btv(k, g[(size_t)j])) return false;
  }
  input_pos.clear();
  input_pos.push_back(i);
  size_t jj = i;
  for (size_t k = 0; k < n_inp; k++) {
    jj = next_pos(pk, L, g, jj + 1);
    // input glyphs must carry the stage's mask; backtrack/lookahead are
    // not mask-checked (HarfBuzz semantics, shaper._match_ctx)
    if (jj >= g.size() || !inv(k, g[jj]) || !mask_ok(mk, req, jj))
      return false;
    input_pos.push_back(jj);
  }
  jj = input_pos.back();
  for (size_t k = 0; k < n_la; k++) {
    jj = next_pos(pk, L, g, jj + 1);
    if (jj >= g.size() || !lav(k, g[jj])) return false;
  }
  return true;
}

// ---- GSUB (shaper._try_entry_at / _apply_plan) -------------------------------

long try_sub_entry(const FdFontPack *pk, const Lookup &L, const Entry &e,
                   std::vector<uint16_t> &g, std::vector<uint32_t> &cl,
                   std::vector<uint32_t> &cle, Comps &comps, size_t i,
                   Masks *mk = nullptr, uint16_t req = 0);

// nested lookups run at the recorded INPUT indices; earlier records may
// change the sequence length, shifting later positions (shaper's ctx branch)
long apply_nested_sub(const FdFontPack *pk,
                      const std::vector<std::pair<uint16_t, uint16_t>> &recs,
                      const std::vector<size_t> &input_pos,
                      std::vector<uint16_t> &g, std::vector<uint32_t> &cl,
                      std::vector<uint32_t> &cle, Comps &comps,
                      Masks *mk = nullptr, uint16_t req = 0) {
  long end = (long)input_pos.back() + 1;
  long delta = 0;
  for (auto [seq_idx, nli] : recs) {
    if (seq_idx >= input_pos.size() || nli >= pk->gsub.size()) continue;
    long pos = (long)input_pos[seq_idx] + delta;
    if (pos < 0 || (size_t)pos >= g.size()) continue;
    const Lookup &NL = pk->gsub[nli];
    if (skipped(pk, NL, g[(size_t)pos])) continue;
    long before = (long)g.size();
    for (const Entry &ne : NL.entries)
      if (try_sub_entry(pk, NL, ne, g, cl, cle, comps, (size_t)pos, mk,
                        req) >= 0)
        break;
    delta += (long)g.size() - before;
  }
  return end + delta;
}

// Returns the next cursor position on match, or -1.
long try_sub_entry(const FdFontPack *pk, const Lookup &L, const Entry &e,
                   std::vector<uint16_t> &g, std::vector<uint32_t> &cl,
                   std::vector<uint32_t> &cle, Comps &comps, size_t i,
                   Masks *mk, uint16_t req) {
  switch (e.kind) {
    case K_SINGLE: {
      size_t lo = 0, hi = e.single.size();
      while (lo < hi) {
        size_t mid = (lo + hi) / 2;
        if (e.single[mid].from < g[i])
          lo = mid + 1;
        else
          hi = mid;
      }
      if (lo >= e.single.size() || e.single[lo].from != g[i]) return -1;
      g[i] = e.single[lo].to;
      return (long)i + 1;
    }
    case K_MULTIPLE: {
      auto it = e.multiple.find(g[i]);
      if (it == e.multiple.end()) return -1;
      const auto &seq = it->second;
      if (seq.empty()) {  // glyph deletion (HarfBuzz semantics)
        g.erase(g.begin() + i);
        cl.erase(cl.begin() + i);
        cle.erase(cle.begin() + i);
        comps.erase(comps.begin() + i);
        if (mk) mk->erase(mk->begin() + i);
        return (long)i;
      }
      uint32_t c = cl[i];  // decomposed glyphs inherit the source cluster
      uint32_t ce = cle[i];
      g.erase(g.begin() + i);
      g.insert(g.begin() + i, seq.begin(), seq.end());
      cl.erase(cl.begin() + i);
      cl.insert(cl.begin() + i, seq.size(), c);
      cle.erase(cle.begin() + i);
      cle.insert(cle.begin() + i, seq.size(), ce);
      comps.erase(comps.begin() + i);
      comps.insert(comps.begin() + i, seq.size(), {1, -1});
      if (mk) {  // decomposed glyphs inherit the source mask
        uint16_t m = (*mk)[i];
        mk->erase(mk->begin() + i);
        mk->insert(mk->begin() + i, seq.size(), m);
      }
      return (long)(i + seq.size());
    }
    case K_LIGA: {
      auto it = e.liga.find(g[i]);
      if (it == e.liga.end()) return -1;
      for (const LigaCand &cand : it->second) {
        std::vector<size_t> pos{i};
        size_t j = i + 1;
        bool okm = true;
        for (uint16_t comp : cand.rest) {
          j = next_pos(pk, L, g, j);
          if (j >= g.size() || g[j] != comp || !mask_ok(mk, req, j)) {
            okm = false;
            break;
          }
          pos.push_back(j);
          j++;
        }
        if (!okm) continue;
        // the ligature replaces the first component; later matched
        // components are removed, skipped glyphs in between stay put,
        // tagged with the ligature component they followed (GPOS 5
        // anchors are per-component)
        g[i] = cand.result;
        cl[i] = cl[pos[0]];
        cle[i] = cle[pos.back()];  // (start of first, end of last) component
        comps[i] = {(uint16_t)pos.size(), -1};
        for (size_t k = 0; k + 1 < pos.size(); k++)
          for (size_t q = pos[k] + 1; q < pos[k + 1]; q++)
            comps[q].second = (int16_t)k;
        for (size_t k = pos.size(); k-- > 1;) {
          g.erase(g.begin() + pos[k]);
          cl.erase(cl.begin() + pos[k]);
          cle.erase(cle.begin() + pos[k]);
          comps.erase(comps.begin() + pos[k]);
          if (mk) mk->erase(mk->begin() + pos[k]);
        }
        return (long)i + 1;
      }
      return -1;
    }
    case K_RCHAIN: {
      const RchainTable &t = e.rchain;
      size_t lo = 0, hi = t.map.size();
      while (lo < hi) {
        size_t mid = (lo + hi) / 2;
        if (t.map[mid].from < g[i])
          lo = mid + 1;
        else
          hi = mid;
      }
      if (lo >= t.map.size() || t.map[lo].from != g[i]) return -1;
      long j = (long)i;
      for (const auto &want : t.bt) {
        j = prev_pos(pk, L, g, j - 1);
        if (j < 0 || !sorted_contains(want, g[(size_t)j])) return -1;
      }
      size_t jj = i;
      for (const auto &want : t.la) {
        jj = next_pos(pk, L, g, jj + 1);
        if (jj >= g.size() || !sorted_contains(want, g[jj])) return -1;
      }
      g[i] = t.map[lo].to;
      return (long)i + 1;
    }
    case K_CTX1: {
      auto it = e.ctx1.rules.find(g[i]);
      if (it == e.ctx1.rules.end()) return -1;
      std::vector<size_t> input_pos;
      for (const CtxRule &rule : it->second) {
        auto gv = [](const std::vector<uint16_t> *vals) {
          return [vals](size_t k, uint16_t gg) { return (*vals)[k] == gg; };
        };
        if (match_ctx(pk, L, g, i, rule.bt.size(), rule.inp.size(),
                      rule.la.size(), gv(&rule.bt), gv(&rule.inp),
                      gv(&rule.la), input_pos, mk, req))
          return apply_nested_sub(pk, rule.recs, input_pos, g, cl, cle,
                                  comps, mk, req);
      }
      return -1;
    }
    case K_CTX2: {
      const Ctx2Table &t = e.ctx2;
      if (!sorted_contains(t.cov, g[i])) return -1;
      uint16_t ci = (uint16_t)cls_of(t.in_cd, g[i]);
      auto it = t.rules.find(ci);
      if (it == t.rules.end()) return -1;
      std::vector<size_t> input_pos;
      for (const CtxRule &rule : it->second) {
        auto cv = [](const std::vector<uint16_t> *vals,
                     const std::vector<std::pair<uint16_t, uint16_t>> *cd) {
          return [vals, cd](size_t k, uint16_t gg) {
            return cls_of(*cd, gg) == (int)(*vals)[k];
          };
        };
        if (match_ctx(pk, L, g, i, rule.bt.size(), rule.inp.size(),
                      rule.la.size(), cv(&rule.bt, &t.bt_cd),
                      cv(&rule.inp, &t.in_cd), cv(&rule.la, &t.la_cd),
                      input_pos, mk, req))
          return apply_nested_sub(pk, rule.recs, input_pos, g, cl, cle,
                                  comps, mk, req);
      }
      return -1;
    }
    case K_CTX3: {
      const Ctx3Table &t = e.ctx3;
      if (t.inp.empty() || !sorted_contains(t.inp[0], g[i])) return -1;
      std::vector<size_t> input_pos;
      auto sv = [](const std::vector<std::vector<uint16_t>> *sets,
                   size_t off) {
        return [sets, off](size_t k, uint16_t gg) {
          return sorted_contains((*sets)[k + off], gg);
        };
      };
      if (!match_ctx(pk, L, g, i, t.bt.size(), t.inp.size() - 1, t.la.size(),
                     sv(&t.bt, 0), sv(&t.inp, 1), sv(&t.la, 0), input_pos,
                     mk, req))
        return -1;
      return apply_nested_sub(pk, t.recs, input_pos, g, cl, cle, comps, mk,
                              req);
    }
    default:
      return -1;
  }
}

// ---- GPOS kern (shaper._try_pos_entry_at / position) -------------------------

long try_pos_entry(const FdFontPack *pk, const Lookup &L, const Entry &e,
                   const std::vector<uint16_t> &g, std::vector<int32_t> &d,
                   size_t i);

// nested GPOS lookups run at the recorded input indices (lengths never
// change on the positioning pass)
long apply_nested_pos(const FdFontPack *pk,
                      const std::vector<std::pair<uint16_t, uint16_t>> &recs,
                      const std::vector<size_t> &input_pos,
                      const std::vector<uint16_t> &g,
                      std::vector<int32_t> &d) {
  for (auto [seq_idx, nli] : recs) {
    if (seq_idx >= input_pos.size() || nli >= pk->gpos.size()) continue;
    size_t pos = input_pos[seq_idx];
    const Lookup &NL = pk->gpos[nli];
    if (skipped(pk, NL, g[pos])) continue;
    for (const Entry &ne : NL.entries)
      if (try_pos_entry(pk, NL, ne, g, d, pos) >= 0) break;
  }
  return (long)input_pos.back() + 1;
}

long try_pos_entry(const FdFontPack *pk, const Lookup &L, const Entry &e,
                   const std::vector<uint16_t> &g, std::vector<int32_t> &d,
                   size_t i) {
  switch (e.kind) {
    case K_POS1: {
      size_t lo = 0, hi = e.pos1.size();
      while (lo < hi) {
        size_t mid = (lo + hi) / 2;
        if (e.pos1[mid].gid < g[i])
          lo = mid + 1;
        else
          hi = mid;
      }
      if (lo >= e.pos1.size() || e.pos1[lo].gid != g[i]) return -1;
      d[i] += e.pos1[lo].dx;
      return (long)i + 1;
    }
    case K_POS2S: {
      size_t j = next_pos(pk, L, g, i + 1);
      if (j >= g.size()) return -1;
      size_t lo = 0, hi = e.pos2s.size();
      uint32_t key = ((uint32_t)g[i] << 16) | g[j];
      while (lo < hi) {
        size_t mid = (lo + hi) / 2;
        uint32_t mk = ((uint32_t)e.pos2s[mid].g1 << 16) | e.pos2s[mid].g2;
        if (mk < key)
          lo = mid + 1;
        else
          hi = mid;
      }
      if (lo >= e.pos2s.size() || e.pos2s[lo].g1 != g[i] ||
          e.pos2s[lo].g2 != g[j])
        return -1;
      d[i] += e.pos2s[lo].v1;
      if (e.pos2s[lo].v2) {
        d[j] += e.pos2s[lo].v2;
        return (long)j + 1;  // Value2 set -> move past the second glyph
      }
      return (long)j;  // second glyph may start the next pair
    }
    case K_POS2C: {
      const Pos2cTable &t = e.pos2c;
      if (!sorted_contains(t.cov, g[i])) return -1;
      size_t j = next_pos(pk, L, g, i + 1);
      if (j >= g.size()) return -1;
      int c1 = cls_of(t.cd1, g[i]);
      int c2 = cls_of(t.cd2, g[j]);
      if ((uint32_t)c1 >= t.c1 || (uint32_t)c2 >= t.c2) return -1;
      auto v = t.mat[(size_t)c1 * t.c2 + c2];
      if (!v.first && !v.second) return -1;  // absent matrix cell = no match
      d[i] += v.first;
      if (v.second) {
        d[j] += v.second;
        return (long)j + 1;
      }
      return (long)j;
    }
    case K_CTX1: {
      auto it = e.ctx1.rules.find(g[i]);
      if (it == e.ctx1.rules.end()) return -1;
      std::vector<size_t> input_pos;
      for (const CtxRule &rule : it->second) {
        auto gv = [](const std::vector<uint16_t> *vals) {
          return [vals](size_t k, uint16_t gg) { return (*vals)[k] == gg; };
        };
        if (match_ctx(pk, L, g, i, rule.bt.size(), rule.inp.size(),
                      rule.la.size(), gv(&rule.bt), gv(&rule.inp),
                      gv(&rule.la), input_pos))
          return apply_nested_pos(pk, rule.recs, input_pos, g, d);
      }
      return -1;
    }
    case K_CTX2: {
      const Ctx2Table &t = e.ctx2;
      if (!sorted_contains(t.cov, g[i])) return -1;
      uint16_t ci = (uint16_t)cls_of(t.in_cd, g[i]);
      auto it = t.rules.find(ci);
      if (it == t.rules.end()) return -1;
      std::vector<size_t> input_pos;
      for (const CtxRule &rule : it->second) {
        auto cv = [](const std::vector<uint16_t> *vals,
                     const std::vector<std::pair<uint16_t, uint16_t>> *cd) {
          return [vals, cd](size_t k, uint16_t gg) {
            return cls_of(*cd, gg) == (int)(*vals)[k];
          };
        };
        if (match_ctx(pk, L, g, i, rule.bt.size(), rule.inp.size(),
                      rule.la.size(), cv(&rule.bt, &t.bt_cd),
                      cv(&rule.inp, &t.in_cd), cv(&rule.la, &t.la_cd),
                      input_pos))
          return apply_nested_pos(pk, rule.recs, input_pos, g, d);
      }
      return -1;
    }
    case K_CTX3: {
      const Ctx3Table &t = e.ctx3;
      if (t.inp.empty() || !sorted_contains(t.inp[0], g[i])) return -1;
      std::vector<size_t> input_pos;
      auto sv = [](const std::vector<std::vector<uint16_t>> *sets,
                   size_t off) {
        return [sets, off](size_t k, uint16_t gg) {
          return sorted_contains((*sets)[k + off], gg);
        };
      };
      if (!match_ctx(pk, L, g, i, t.bt.size(), t.inp.size() - 1, t.la.size(),
                     sv(&t.bt, 0), sv(&t.inp, 1), sv(&t.la, 0), input_pos))
        return -1;
      return apply_nested_pos(pk, t.recs, input_pos, g, d);
    }
    default:
      return -1;
  }
}

inline float kern0_lookup(const FdFontPack *pk, uint16_t l, uint16_t r) {
  uint32_t key = ((uint32_t)l << 16) | r;
  size_t lo = 0, hi = pk->kern0.size();
  while (lo < hi) {
    size_t mid = (lo + hi) / 2;
    uint32_t mk = ((uint32_t)pk->kern0[mid].left << 16) | pk->kern0[mid].right;
    if (mk < key)
      lo = mid + 1;
    else
      hi = mid;
  }
  if (lo < pk->kern0.size() && pk->kern0[lo].left == l &&
      pk->kern0[lo].right == r)
    return (float)pk->kern0[lo].value;
  return 0.0f;
}

}  // namespace

// ---- public API --------------------------------------------------------------

extern "C" {

FdFontPack *fd_pack_load(const void *blob, int32_t len) {
  if (blob == nullptr || len < 48) return nullptr;
  const uint8_t *base = (const uint8_t *)blob;
  Reader r{base, base + len};
  if (r.u32() != kMagic || r.u32() != kVersion) return nullptr;
  auto pk = new FdFontPack();
  pk->upem = r.f32();
  pk->ascent = r.f32();
  pk->descent = r.f32();
  pk->line_gap = r.f32();
  uint32_t n_glyphs = r.u32(), n_cmap = r.u32(), n_sub = r.u32(),
           n_pos = r.u32();
  pk->flags = r.u32();
  uint32_t n_kern0 = r.u32();
  pk->n_glyphs = n_glyphs;
  bool ok = r.ok && n_glyphs <= (1u << 20) && n_cmap <= (1u << 22) &&
            n_sub + n_pos <= (1u << 16) && n_kern0 <= (1u << 24) &&
            // every top-level count must also fit the remaining blob bytes
            // (cmap 8B, advances 4B + 2x 1B tables, kern rows 8B) — reject
            // instead of allocating from a lying header
            r.can(n_cmap, 8) && r.can(n_glyphs, 6) && r.can(n_kern0, 8);
  if (ok) {
    pk->cmap.resize(n_cmap);
    for (uint32_t k = 0; k < n_cmap; k++) {
      pk->cmap[k].first = r.u32();
      pk->cmap[k].second = r.u32();
    }
    pk->advances.resize(n_glyphs);
    for (uint32_t k = 0; k < n_glyphs; k++) pk->advances[k] = r.f32();
    pk->gdef.resize(n_glyphs);
    if (r.need(n_glyphs)) {
      std::memcpy(pk->gdef.data(), r.p, n_glyphs);
      r.p += n_glyphs;
    }
    r.align4(base);
    pk->mattach.resize(n_glyphs);
    if (r.need(n_glyphs)) {
      std::memcpy(pk->mattach.data(), r.p, n_glyphs);
      r.p += n_glyphs;
    }
    r.align4(base);
    // v2: each lookup section leads with its plan-order index list
    uint32_t n_sub_plan = r.u32();
    ok = ok && r.can(n_sub_plan, 4) && n_sub_plan <= (1u << 16);
    if (ok) {
      pk->sub_plan.resize(n_sub_plan);
      for (uint32_t k = 0; k < n_sub_plan; k++) pk->sub_plan[k] = r.u32();
    }
    pk->gsub.resize(n_sub);
    for (uint32_t k = 0; k < n_sub && ok; k++)
      ok = parse_lookup(r, base, pk->gsub[k]);
    uint32_t n_pos_plan = ok ? r.u32() : 0;
    ok = ok && r.can(n_pos_plan, 4) && n_pos_plan <= (1u << 16);
    if (ok) {
      pk->pos_plan.resize(n_pos_plan);
      for (uint32_t k = 0; k < n_pos_plan; k++) pk->pos_plan[k] = r.u32();
    }
    pk->gpos.resize(n_pos);
    for (uint32_t k = 0; k < n_pos && ok; k++)
      ok = parse_lookup(r, base, pk->gpos[k]);
    // plan indices and nested rule records must stay in range
    for (uint32_t idx : pk->sub_plan)
      if (idx >= n_sub) ok = false;
    for (uint32_t idx : pk->pos_plan)
      if (idx >= n_pos) ok = false;
    pk->kern0.resize(n_kern0);
    for (uint32_t k = 0; k < n_kern0; k++) {
      pk->kern0[k].left = r.u16();
      pk->kern0[k].right = r.u16();
      pk->kern0[k].value = r.i16();
      r.u16();  // pad
    }
    // ---- GPOS anchor sections ------------------------------------------
    auto parse_marks = [&](std::unordered_map<uint16_t, MarkRec> &m) {
      uint32_t nm = r.u32();
      if (!r.can(nm, 8)) return false;
      for (uint32_t k = 0; k < nm; k++) {
        uint16_t g = r.u16();
        MarkRec rec;
        rec.cls = r.u16();
        rec.mx = r.i16();
        rec.my = r.i16();
        m.emplace(g, rec);
      }
      return r.ok;
    };
    auto parse_anchor_map =
        [&](std::unordered_map<uint16_t, AnchorSet> &bases) {
          uint32_t nb = r.u32();
          if (!r.can(nb, 4)) return false;
          for (uint32_t k = 0; k < nb && r.ok; k++) {
            uint16_t g = r.u16();
            uint16_t na = r.u16();
            if (!r.can(na, 6)) return false;
            AnchorSet &as = bases[g];
            for (uint16_t q = 0; q < na; q++) {
              uint16_t cls = r.u16();
              int16_t ax = r.i16();
              int16_t ay = r.i16();
              as.emplace(cls, std::make_pair(ax, ay));
            }
          }
          r.align4(base);
          return r.ok;
        };
    if (ok) {
      uint32_t n_curs = r.u32();
      ok = r.can(n_curs, 4);
      for (uint32_t t = 0; t < n_curs && ok; t++) {
        uint32_t nr = r.u32();
        ok = r.can(nr, 12);
        std::unordered_map<uint16_t, CursRow> table;
        for (uint32_t k = 0; k < nr && ok; k++) {
          uint16_t g = r.u16();
          CursRow row;
          row.flags = (uint8_t)r.u16();  // u8 flags + u8 pad ride one u16
          row.ex = r.i16();
          row.ey = r.i16();
          row.xx = r.i16();
          row.xy = r.i16();
          table.emplace(g, row);
        }
        if (ok) pk->cursive.push_back(std::move(table));
      }
      uint32_t n_mb = ok ? r.u32() : 0;
      ok = ok && r.can(n_mb, 8);
      for (uint32_t t = 0; t < n_mb && ok; t++) {
        MarkBaseTable mb;
        ok = parse_marks(mb.marks) && parse_anchor_map(mb.bases);
        if (ok) pk->mark_base.push_back(std::move(mb));
      }
      uint32_t n_ml = ok ? r.u32() : 0;
      ok = ok && r.can(n_ml, 8);
      for (uint32_t t = 0; t < n_ml && ok; t++) {
        MarkLigTable ml;
        ok = parse_marks(ml.marks);
        uint32_t nl = ok ? r.u32() : 0;
        ok = ok && r.can(nl, 4);
        for (uint32_t k = 0; k < nl && ok; k++) {
          uint16_t g = r.u16();
          uint16_t nc = r.u16();
          ok = r.can(nc, 2);
          auto &comps = ml.ligs[g];
          for (uint16_t c = 0; c < nc && ok; c++) {
            uint16_t na = r.u16();
            ok = r.can(na, 6);
            AnchorSet as;
            for (uint16_t q = 0; q < na && ok; q++) {
              uint16_t cls = r.u16();
              int16_t ax = r.i16();
              int16_t ay = r.i16();
              as.emplace(cls, std::make_pair(ax, ay));
            }
            comps.push_back(std::move(as));
          }
        }
        r.align4(base);
        ok = ok && r.ok;
        if (ok) pk->mark_lig.push_back(std::move(ml));
      }
      uint32_t n_mm = ok ? r.u32() : 0;
      ok = ok && r.can(n_mm, 8);
      for (uint32_t t = 0; t < n_mm && ok; t++) {
        MarkBaseTable mm;
        ok = parse_marks(mm.marks) && parse_anchor_map(mm.bases);
        if (ok) pk->mark_mark.push_back(std::move(mm));
      }
      // ---- v3 staged Arabic: joining classes + stage plans ---------------
      if (ok && r.need(sizeof(pk->arab_join))) {
        std::memcpy(pk->arab_join, r.p, sizeof(pk->arab_join));
        r.p += sizeof(pk->arab_join);
      } else {
        ok = false;
      }
      for (int t = 0; t < 7 && ok; t++) {
        uint32_t np = r.u32();
        ok = r.can(np, 4) && np <= (1u << 16);
        if (!ok) break;
        pk->arab_plans[t].resize(np);
        for (uint32_t k = 0; k < np; k++) {
          uint32_t idx = r.u32();
          if (idx >= n_sub) ok = false;
          pk->arab_plans[t][k] = idx;
        }
      }
      // ---- v4 syllable pipelines: 21 stage plans -------------------------
      for (int t = 0; t < 21 && ok; t++) {
        uint32_t np = r.u32();
        ok = r.can(np, 4) && np <= (1u << 16);
        if (!ok) break;
        pk->syl_plans[t].resize(np);
        for (uint32_t k = 0; k < np; k++) {
          uint32_t idx = r.u32();
          if (idx >= n_sub) ok = false;
          pk->syl_plans[t][k] = idx;
        }
      }
      // ---- v5 bidi: RLE class table + mirrored ranges --------------------
      if (ok) {
        uint32_t nb = r.u32();
        ok = r.can(nb, 12) && nb <= (1u << 16);
        if (ok) {
          pk->bidi_cls.resize(nb);
          for (uint32_t k = 0; k < nb; k++) {
            uint32_t s0 = r.u32(), e0 = r.u32(), c0 = r.u32();
            if (c0 >= 23 || e0 <= s0) ok = false;
            pk->bidi_cls[k] = {s0, e0, c0};
          }
        }
      }
      if (ok) {
        uint32_t nm = r.u32();
        ok = r.can(nm, 8) && nm <= (1u << 14);
        if (ok) {
          pk->mirrored.resize(nm);
          for (uint32_t k = 0; k < nm; k++) {
            uint32_t s0 = r.u32(), e0 = r.u32();
            if (e0 <= s0) ok = false;
            pk->mirrored[k] = {s0, e0};
          }
        }
      }
    }
  }
  if (!ok || !r.ok) {
    delete pk;
    return nullptr;
  }
  return pk;
}

void fd_pack_set_allow_reduced(FdFontPack *pack, int32_t allow) {
  pack->allow_reduced = allow != 0;
}

void fd_pack_free(FdFontPack *pack) { delete pack; }

float fd_pack_metric(const FdFontPack *pack, int32_t which) {
  switch (which) {
    case 0:
      return pack->upem;
    case 1:
      return pack->ascent;
    case 2:
      return pack->descent;
    case 3:
      return pack->line_gap;
    default:
      return 0.0f;
  }
}

uint32_t fd_pack_flags(const FdFontPack *pack) { return pack->flags; }

int32_t fd_pack_glyph_count(const FdFontPack *pack) {
  return (int32_t)pack->n_glyphs;
}

uint32_t fd_pack_glyph_id(const FdFontPack *pack, uint32_t codepoint) {
  size_t lo = 0, hi = pack->cmap.size();
  while (lo < hi) {
    size_t mid = (lo + hi) / 2;
    if (pack->cmap[mid].first < codepoint)
      lo = mid + 1;
    else
      hi = mid;
  }
  if (lo < pack->cmap.size() && pack->cmap[lo].first == codepoint)
    return pack->cmap[lo].second;
  return 0;
}

float fd_pack_advance(const FdFontPack *pack, uint32_t gid) {
  return gid < pack->advances.size() ? pack->advances[gid] : 0.0f;
}

namespace {

// v3 shapes Arabic natively (staged masked pipeline below); v4 adds the
// Indic/USE syllable pipelines (segmentation + per-syllable masks +
// reordering) — the routing mirrors substitute_ex's elif chain
// (shaper.py:626-640)
inline bool arabic_script_cp(uint32_t cp) {  // shaper._is_arabic_script
  return (cp >= 0x0600 && cp <= 0x06FF) || (cp >= 0x0750 && cp <= 0x077F);
}

inline bool indic_script_cp(uint32_t cp) {  // indic.is_devanagari
  return cp >= 0x0900 && cp <= 0x097F;
}

inline bool use_script_cp(uint32_t cp) {  // use.is_khmer / is_myanmar
  return (cp >= 0x1780 && cp <= 0x17FF) || (cp >= 0x1000 && cp <= 0x109F);
}

// Unicode joining class from the pack's table (shaper._joining_class,
// evaluated at pack build): 0=U 1=R 2=D 3=T
constexpr uint8_t J_U = 0, J_R = 1, J_D = 2, J_T = 3;

inline uint8_t joining_class(const FdFontPack *pk, uint32_t cp) {
  if (cp >= 0x0600 && cp <= 0x06FF) return pk->arab_join[cp - 0x0600];
  if (cp >= 0x0750 && cp <= 0x077F) return pk->arab_join[256 + cp - 0x0750];
  return J_U;
}

// per-character positional mask in logical order (shaper.arabic_forms +
// the mask construction in _substitute_arabic: '' → isol; non-Arabic or
// transparent positions carry no tag at all — 0 fails every masked stage)
void arabic_masks(const FdFontPack *pk, const std::vector<uint32_t> &cps,
                  Masks &mk) {
  size_t n = cps.size();
  std::vector<uint8_t> cls(n);
  for (size_t k = 0; k < n; k++) cls[k] = joining_class(pk, cps[k]);
  mk.assign(n, 0);
  for (size_t k = 0; k < n; k++) {
    if (!arabic_script_cp(cps[k]) || cls[k] == J_T) continue;  // None
    if (cls[k] != J_R && cls[k] != J_D) {
      mk[k] = M_ISOL;  // '' form defaults to the isol tag
      continue;
    }
    long j = (long)k - 1;  // previous non-transparent connects forward?
    while (j >= 0 && cls[(size_t)j] == J_T) j--;
    bool before = j >= 0 && cls[(size_t)j] == J_D;
    size_t q = k + 1;  // next non-transparent connects backward?
    while (q < n && cls[q] == J_T) q++;
    bool after = cls[k] == J_D && q < n &&
                 (cls[q] == J_R || cls[q] == J_D);
    mk[k] = (before && after) ? M_MEDI
            : before          ? M_FINA
            : after           ? M_INIT
                              : M_ISOL;
  }
}

// HarfBuzz's Thai/Lao above-base-mark sets (shaper._THAI_ABOVE_MARKS;
// the Lao set is the Thai set + 0x80 exactly)
inline bool thai_above_mark(uint32_t cp, bool lao) {
  if (lao) {
    if (cp < 0x0E80 || cp > 0x0EFF) return false;
    cp -= 0x80;
  } else if (cp > 0x0E7F) {
    return false;
  }
  return cp == 0x0E31 || (cp >= 0x0E34 && cp <= 0x0E37) ||
         (cp >= 0x0E47 && cp <= 0x0E4E);
}

// the Uniscribe-compatible SARA AM decomposition (hb-ot-shaper-thai.cc via
// shaper.thai_sara_am_preprocess): U+0E33/U+0EB3 → NIKHAHIT + SARA AA with
// the nikhahit moved back over contiguous above-base marks; cluster merges
// follow hb merge_out_clusters exactly (crossed → whole moved span incl.
// the SARA AA; uncrossed → merge with the previous cluster)
void thai_preprocess(const FdFontPack *pk, std::vector<uint32_t> &cps,
                     std::vector<uint32_t> &cl, std::vector<uint32_t> &cle) {
  std::vector<uint32_t> out_cp, out_cl, out_ce;
  out_cp.reserve(cps.size() + 4);
  out_cl.reserve(cps.size() + 4);
  out_ce.reserve(cps.size() + 4);
  for (size_t k = 0; k < cps.size(); k++) {
    uint32_t cp = cps[k];
    uint32_t nik = 0, aa = 0;
    bool lao = false;
    if (cp == 0x0E33) {
      nik = 0x0E4D;
      aa = 0x0E32;
    } else if (cp == 0x0EB3) {
      nik = 0x0ECD;
      aa = 0x0EB2;
      lao = true;
    }
    if (!nik || !fd_pack_glyph_id(pk, nik) || !fd_pack_glyph_id(pk, aa)) {
      out_cp.push_back(cp);
      out_cl.push_back(cl[k]);
      out_ce.push_back(cle[k]);
      continue;
    }
    size_t j = out_cp.size();
    while (j > 0 && thai_above_mark(out_cp[j - 1], lao)) j--;
    out_cp.insert(out_cp.begin() + j, nik);
    out_cl.insert(out_cl.begin() + j, cl[k]);
    out_ce.insert(out_ce.begin() + j, cle[k]);
    out_cp.push_back(aa);
    out_cl.push_back(cl[k]);
    out_ce.push_back(cle[k]);
    size_t end = out_cp.size();
    size_t lo_i = end, hi_i = end;  // merged range [lo_i, hi_i)
    if (j + 2 < end) {
      lo_i = j;
      hi_i = end;
    } else if (j > 0) {
      lo_i = j - 1;
      hi_i = end;
    }
    if (hi_i > lo_i + 1) {
      uint32_t lo = out_cl[lo_i], hi = out_ce[lo_i];
      for (size_t q = lo_i; q < hi_i; q++) {
        if (out_cl[q] < lo) lo = out_cl[q];
        if (out_ce[q] > hi) hi = out_ce[q];
      }
      for (size_t q = lo_i; q < hi_i; q++) {
        out_cl[q] = lo;
        out_ce[q] = hi;
      }
    }
  }
  cps.swap(out_cp);
  cl.swap(out_cl);
  cle.swap(out_ce);
}

struct ShapeOut {
  std::vector<uint16_t> g;
  std::vector<uint32_t> cl;   // cluster START per glyph (the public output)
  std::vector<uint32_t> cle;  // cluster END (exclusive) — the second half of
                              // Python's (start, end) tuples; load-bearing
                              // for the syllable pipelines' identity/range
                              // matching and cluster merges
  Comps comps;
};

// one plan pass over the run (shaper._apply_plan): rchain lookups walk
// last-to-first; masked stages (`req` != 0) only start matches at tagged
// positions, and input glyphs inside a match must carry the tag too
void apply_sub_plan(const FdFontPack *pk, const std::vector<uint32_t> &plan,
                    ShapeOut &out, Masks *mk, uint16_t req) {
  for (uint32_t pi : plan) {
    const Lookup &L = pk->gsub[pi];
    if (L.entries.empty()) continue;
    if (L.entries[0].kind == K_RCHAIN) {
      // reverse chaining lookups walk the sequence last-to-first
      for (long i = (long)out.g.size() - 1; i >= 0; i--) {
        if (skipped(pk, L, out.g[(size_t)i]) ||
            !mask_ok(mk, req, (size_t)i))
          continue;
        for (const Entry &e : L.entries)
          if (try_sub_entry(pk, L, e, out.g, out.cl, out.cle, out.comps,
                            (size_t)i, mk, req) >= 0)
            break;
      }
      continue;
    }
    size_t i = 0;
    while (i < out.g.size()) {
      if (skipped(pk, L, out.g[i]) || !mask_ok(mk, req, i)) {
        i++;
        continue;
      }
      long nxt = -1;
      for (const Entry &e : L.entries) {
        nxt = try_sub_entry(pk, L, e, out.g, out.cl, out.cle, out.comps, i,
                            mk, req);
        if (nxt >= 0) break;
      }
      i = nxt >= 0 ? (size_t)nxt : i + 1;
    }
  }
}

// ======== Devanagari syllable analysis (text/indic.py, line-for-line) ========

namespace indic {

constexpr uint32_t RA = 0x0930, HALANT = 0x094D;
constexpr uint32_t ZWNJ = 0x200C, ZWJ = 0x200D;
enum Cat {
  C_OTHER = 0, C_CONS, C_VOWEL, C_MATRA_PRE, C_MATRA, C_NUKTA, C_HALANT_C,
  C_SM, C_ZWJ_C, C_AVAGRAHA, C_VEDIC
};

inline bool is_deva(uint32_t cp) { return cp >= 0x0900 && cp <= 0x097F; }

// indic.category — the OpenType Devanagari classes (static Unicode data;
// the parity fuzz vs the Python twin pins the tables)
inline int category(uint32_t cp) {
  if ((cp >= 0x0915 && cp <= 0x0939) || (cp >= 0x0958 && cp <= 0x095F) ||
      (cp >= 0x0978 && cp <= 0x097F))
    return C_CONS;
  if ((cp >= 0x0904 && cp <= 0x0914) || cp == 0x0960 || cp == 0x0961 ||
      (cp >= 0x0972 && cp <= 0x0977) || cp == 0x0950)
    return C_VOWEL;
  if (cp == 0x093F) return C_MATRA_PRE;
  if (cp == 0x093A || cp == 0x093B || (cp >= 0x093E && cp <= 0x094C) ||
      cp == 0x094E || cp == 0x094F || (cp >= 0x0955 && cp <= 0x0957) ||
      cp == 0x0962 || cp == 0x0963)
    return C_MATRA;
  if (cp == 0x093C) return C_NUKTA;
  if (cp == HALANT) return C_HALANT_C;
  if (cp >= 0x0900 && cp <= 0x0903) return C_SM;
  if (cp == ZWNJ || cp == ZWJ) return C_ZWJ_C;
  if (cp == 0x093D) return C_AVAGRAHA;
  if (cp >= 0x0951 && cp <= 0x0954) return C_VEDIC;
  return C_OTHER;
}

// indic.next_syllable
size_t next_syllable(const uint32_t *cps, size_t n, size_t start) {
  size_t i = start;
  int cat = category(cps[i]);
  auto eat_nukta = [&]() {
    if (i < n && category(cps[i]) == C_NUKTA) i++;
  };
  if (cat == C_CONS || cat == C_VOWEL) {
    i++;
    eat_nukta();
    while (i < n && category(cps[i]) == C_HALANT_C) {
      size_t j = i + 1;
      if (j < n && category(cps[j]) == C_ZWJ_C) j++;
      if (j < n && category(cps[j]) == C_CONS) {
        i = j + 1;
        eat_nukta();
      } else {  // trailing (dead) halant, optionally + ZWNJ
        i++;
        if (i < n && category(cps[i]) == C_ZWJ_C) i++;
        break;
      }
    }
    while (i < n &&
           (category(cps[i]) == C_MATRA_PRE || category(cps[i]) == C_MATRA)) {
      i++;
      eat_nukta();
    }
    while (i < n && category(cps[i]) == C_SM) i++;
    while (i < n && category(cps[i]) == C_VEDIC) i++;
    return i;
  }
  if (cat == C_SM || cat == C_MATRA || cat == C_MATRA_PRE || cat == C_NUKTA ||
      cat == C_HALANT_C || cat == C_AVAGRAHA || cat == C_VEDIC) {
    i++;  // broken cluster / standalone sign: consume the run of signs
    while (i < n) {
      int c = category(cps[i]);
      if (c == C_MATRA || c == C_MATRA_PRE || c == C_NUKTA || c == C_SM ||
          c == C_VEDIC)
        i++;
      else
        break;
    }
    return i;
  }
  return i + 1;
}

// indic.analyze_syllable: (base index, has_reph)
void analyze(const uint32_t *cps, size_t n, long *base_out, bool *reph_out) {
  std::vector<int> cats(n);
  for (size_t k = 0; k < n; k++) cats[k] = category(cps[k]);
  bool has_reph = false;
  if (n > 2 && cps[0] == RA && cats[1] == C_HALANT_C) {
    for (size_t k = 2; k < n; k++)
      if (cats[k] == C_CONS || cats[k] == C_VOWEL) {
        has_reph = true;
        break;
      }
  }
  long limit = has_reph ? 2 : 0;
  long base = -1;
  for (long k = (long)n - 1; k >= limit; k--) {
    if (cats[(size_t)k] == C_CONS || cats[(size_t)k] == C_VOWEL) {
      base = k;
      break;
    }
  }
  // walk left past below-base (rakar) Ra forms
  while (base > limit && cps[(size_t)base] == RA && base >= 1 &&
         cats[(size_t)base - 1] == C_HALANT_C) {
    bool any_before = false;
    for (long q = limit; q < base - 1; q++)
      if (cats[(size_t)q] == C_CONS || cats[(size_t)q] == C_VOWEL) {
        any_before = true;
        break;
      }
    if (!any_before) break;
    long prev = -1;
    for (long k = base - 2; k >= limit; k--)
      if (cats[(size_t)k] == C_CONS || cats[(size_t)k] == C_VOWEL) {
        prev = k;
        break;
      }
    if (prev < 0) break;
    base = prev;
  }
  *base_out = base;
  *reph_out = has_reph;
}

// indic.build_masks: rphf / half / blwf positional tags
void build_masks(const uint32_t *cps, size_t n, long base, bool has_reph,
                 Masks &mk) {
  std::vector<int> cats(n);
  for (size_t k = 0; k < n; k++) cats[k] = category(cps[k]);
  mk.assign(n, 0);
  if (has_reph) {
    mk[0] |= M_RPHF;
    mk[1] |= M_RPHF;
  }
  size_t start = has_reph ? 2 : 0;
  // half: every consonant BEFORE base that connects forward via halant;
  // halant+ZWNJ blocks the half form
  size_t k = start;
  while ((long)k < base) {
    if (cats[k] == C_CONS || cats[k] == C_VOWEL) {
      size_t j = k + 1;
      if (j < n && cats[j] == C_NUKTA) j++;
      if ((long)j < base && cats[j] == C_HALANT_C) {
        if (!(j + 1 < n && cps[j + 1] == ZWNJ)) {
          for (size_t q = k; q <= j; q++) mk[q] |= M_HALF;
        }
        k = j + 1;
        continue;
      }
    }
    k++;
  }
  // blwf: halant + Ra (rakar), pre or post base, excluding the reph pair
  for (size_t q = start; q + 1 < n; q++) {
    if (cats[q] == C_HALANT_C && cps[q + 1] == RA && (long)(q + 1) != base) {
      mk[q] |= M_BLWF;
      mk[q + 1] |= M_BLWF;
    }
  }
}

}  // namespace indic

// ======== Khmer & Myanmar syllable analysis (text/use.py) =====================

namespace usekm {

constexpr uint32_t ZWNJ = 0x200C, ZWJ = 0x200D;

// ---- Khmer ----
constexpr uint32_t KH_COENG = 0x17D2, KH_RO = 0x179A, KH_ROBAT = 0x17CC;
inline bool is_khmer(uint32_t cp) { return cp >= 0x1780 && cp <= 0x17FF; }
inline bool kh_cons(uint32_t cp) { return cp >= 0x1780 && cp <= 0x17A2; }
inline bool kh_indep(uint32_t cp) { return cp >= 0x17A3 && cp <= 0x17B3; }
inline bool kh_base(uint32_t cp) { return kh_cons(cp) || kh_indep(cp); }
inline bool kh_dep_vowel(uint32_t cp) { return cp >= 0x17B6 && cp <= 0x17C5; }
inline bool kh_vpre(uint32_t cp) {
  return cp == 0x17C1 || cp == 0x17C2 || cp == 0x17C3;
}
inline bool kh_shifter(uint32_t cp) { return cp == 0x17C9 || cp == 0x17CA; }
inline bool kh_sign(uint32_t cp) {
  return cp == 0x17C6 || cp == 0x17C7 || cp == 0x17C8 ||
         (cp >= 0x17CB && cp <= 0x17D1) || cp == 0x17DD;
}

// use.khmer_next_syllable
size_t khmer_next_syllable(const uint32_t *cps, size_t n, size_t start) {
  size_t i = start;
  if (!kh_base(cps[i])) {
    if (kh_dep_vowel(cps[i]) || kh_sign(cps[i]) || kh_shifter(cps[i]) ||
        cps[i] == KH_COENG) {
      i++;
      while (i < n &&
             (kh_dep_vowel(cps[i]) || kh_sign(cps[i]) || kh_shifter(cps[i])))
        i++;
      return i;
    }
    return i + 1;
  }
  i++;
  while (i < n) {
    uint32_t cp = cps[i];
    if (cp == KH_COENG && i + 1 < n && kh_base(cps[i + 1]))
      i += 2;
    else if (kh_dep_vowel(cp) || kh_sign(cp) || kh_shifter(cp) || cp == ZWJ ||
             cp == ZWNJ)
      i++;
    else
      break;
  }
  return i;
}

// use.khmer_masks: coeng+Ro -> pref; other coeng+C -> blwf+pstf (+cfar
// after a pref pair); robat -> abvf
void khmer_masks(const uint32_t *cps, size_t n, Masks &mk) {
  mk.assign(n, 0);
  bool seen_pref = false;
  for (size_t k = 0; k + 1 < n; k++) {
    if (cps[k] == KH_COENG && kh_base(cps[k + 1])) {
      if (cps[k + 1] == KH_RO) {
        mk[k] |= M_PREF;
        mk[k + 1] |= M_PREF;
        seen_pref = true;
      } else {
        for (size_t q = k; q <= k + 1; q++) {
          mk[q] |= M_BLWF | M_PSTF;
          if (seen_pref) mk[q] |= M_CFAR;
        }
      }
    }
  }
  for (size_t k = 0; k < n; k++)
    if (cps[k] == KH_ROBAT) mk[k] |= M_ABVF;
}

// ---- Myanmar ----
constexpr uint32_t MY_NGA = 0x1004, MY_ASAT = 0x103A, MY_VIRAMA = 0x1039;
constexpr uint32_t MY_MED_YA = 0x103B, MY_MED_RA = 0x103C, MY_MED_WA = 0x103D,
                   MY_MED_HA = 0x103E, MY_VPRE = 0x1031;
inline bool is_myanmar(uint32_t cp) { return cp >= 0x1000 && cp <= 0x109F; }
inline bool my_cons(uint32_t cp) {
  return (cp >= 0x1000 && cp <= 0x1020) || cp == 0x103F;
}
inline bool my_indep(uint32_t cp) { return cp >= 0x1021 && cp <= 0x102A; }
inline bool my_base(uint32_t cp) { return my_cons(cp) || my_indep(cp); }
inline bool my_medial(uint32_t cp) { return cp >= 0x103B && cp <= 0x103E; }
inline bool my_dep_vowel(uint32_t cp) { return cp >= 0x102B && cp <= 0x1035; }
inline bool my_sign(uint32_t cp) { return cp >= 0x1036 && cp <= 0x1038; }

// use.myanmar_has_kinzi
inline bool my_has_kinzi(const uint32_t *cps, size_t n, size_t i) {
  return i + 3 < n && cps[i] == MY_NGA && cps[i + 1] == MY_ASAT &&
         cps[i + 2] == MY_VIRAMA && my_base(cps[i + 3]);
}

// use.myanmar_next_syllable
size_t myanmar_next_syllable(const uint32_t *cps, size_t n, size_t start) {
  size_t i = start;
  if (my_has_kinzi(cps, n, i)) i += 3;
  if (i >= n || !my_base(cps[i])) {
    if (i != start) return i;  // kinzi with nothing to attach to
    if (my_dep_vowel(cps[i]) || my_sign(cps[i]) || my_medial(cps[i]) ||
        cps[i] == MY_ASAT) {
      i++;
      while (i < n && (my_dep_vowel(cps[i]) || my_sign(cps[i]))) i++;
      return i;
    }
    return i + 1;
  }
  i++;
  while (i < n) {
    uint32_t cp = cps[i];
    if (cp == MY_VIRAMA && i + 1 < n && my_base(cps[i + 1]))
      i += 2;
    else if (my_medial(cp) || my_dep_vowel(cp) || my_sign(cp) ||
             cp == MY_ASAT || cp == ZWJ || cp == ZWNJ)
      i++;
    else
      break;
  }
  return i;
}

// use.myanmar_masks
void myanmar_masks(const uint32_t *cps, size_t n, bool has_kinzi, Masks &mk) {
  mk.assign(n, 0);
  if (has_kinzi)
    for (size_t q = 0; q < 3; q++) mk[q] |= M_RPHF;
  size_t start = has_kinzi ? 3 : 0;
  for (size_t k = start; k < n; k++) {
    uint32_t cp = cps[k];
    if (cp == MY_MED_RA) {
      mk[k] |= M_PREF;
    } else if (cp == MY_MED_WA || cp == MY_MED_HA) {
      mk[k] |= M_BLWF;
    } else if (cp == MY_MED_YA) {
      mk[k] |= M_PSTF;
    } else if (cp == MY_VIRAMA && k + 1 < n && my_base(cps[k + 1])) {
      mk[k] |= M_BLWF;
      mk[k + 1] |= M_BLWF;
    }
  }
}

// use.myanmar_base_cluster_end
size_t myanmar_base_cluster_end(const uint32_t *cps, size_t n,
                                bool has_kinzi) {
  size_t i = has_kinzi ? 3 : 0;
  if (i < n && my_base(cps[i])) i++;
  while (i < n) {
    uint32_t cp = cps[i];
    if (cp == MY_VIRAMA && i + 1 < n && my_base(cps[i + 1]))
      i += 2;
    else if (cp == MY_MED_YA || cp == MY_MED_WA || cp == MY_MED_HA ||
             cp == MY_ASAT)
      i++;
    else
      break;
  }
  return i;
}

}  // namespace usekm

// ======== syllable pipeline drivers (shaper._substitute_indic/_use) ===========

using ClRange = std::pair<uint32_t, uint32_t>;  // (start, end) source cluster

// build a fresh sub-run for source slice [i, j): pre-GSUB the glyph stream
// is 1:1 with codepoints, clusters (k, k+1) in SOURCE coordinates
void init_subrun(const FdFontPack *pk, const uint32_t *cps, size_t i,
                 size_t j, ShapeOut &s) {
  size_t m = j - i;
  s.g.resize(m);
  s.cl.resize(m);
  s.cle.resize(m);
  s.comps.assign(m, {1, -1});
  for (size_t k = 0; k < m; k++) {
    s.g[k] = (uint16_t)fd_pack_glyph_id(pk, cps[i + k]);
    s.cl[k] = (uint32_t)(i + k);
    s.cle[k] = (uint32_t)(i + k + 1);
  }
}

void append_run(ShapeOut &out, ShapeOut &s) {
  out.g.insert(out.g.end(), s.g.begin(), s.g.end());
  out.cl.insert(out.cl.end(), s.cl.begin(), s.cl.end());
  out.cle.insert(out.cle.end(), s.cle.begin(), s.cle.end());
  out.comps.insert(out.comps.end(), s.comps.begin(), s.comps.end());
}

// one ROW of the five parallel shaping vectors (g/cl/cle/comps + mask):
// every syllable reorder extracts rows and reinserts them elsewhere —
// keep the row definition and the splice in ONE place so a future
// ShapeOut field cannot desynchronize the vectors (the cle column was
// threaded through three hand-written copies of this before)
struct SylRow {
  uint16_t g;
  uint32_t cl, cle;
  std::pair<uint16_t, int16_t> cm;
  uint16_t m;
};

// remove the rows at idxs (ascending) from s/mk and return them in order
std::vector<SylRow> extract_rows(ShapeOut &s, Masks &mk,
                                 const std::vector<size_t> &idxs) {
  std::vector<SylRow> items;
  items.reserve(idxs.size());
  for (size_t k : idxs)
    items.push_back({s.g[k], s.cl[k], s.cle[k], s.comps[k], mk[k]});
  for (size_t q = idxs.size(); q-- > 0;) {
    size_t k = idxs[q];
    s.g.erase(s.g.begin() + k);
    s.cl.erase(s.cl.begin() + k);
    s.cle.erase(s.cle.begin() + k);
    s.comps.erase(s.comps.begin() + k);
    mk.erase(mk.begin() + k);
  }
  return items;
}

// insert the rows contiguously at post-extract index tgt, original order
void insert_rows(ShapeOut &s, Masks &mk, size_t tgt,
                 const std::vector<SylRow> &items) {
  for (size_t off = 0; off < items.size(); off++) {
    const SylRow &it = items[off];
    s.g.insert(s.g.begin() + (tgt + off), it.g);
    s.cl.insert(s.cl.begin() + (tgt + off), it.cl);
    s.cle.insert(s.cle.begin() + (tgt + off), it.cle);
    s.comps.insert(s.comps.begin() + (tgt + off), it.cm);
    mk.insert(mk.begin() + (tgt + off), it.m);
  }
}

// shaper._move_to_front: move every glyph whose source cluster lies inside
// one of `ranges` to the syllable front, preserving relative order
bool move_to_front(ShapeOut &s, Masks &mk,
                   const std::vector<ClRange> &ranges) {
  if (ranges.empty()) return false;
  std::vector<size_t> idxs;
  for (size_t k = 0; k < s.g.size(); k++) {
    for (const ClRange &r : ranges) {
      if (s.cl[k] >= r.first && s.cle[k] <= r.second) {
        idxs.push_back(k);
        break;
      }
    }
  }
  bool already_front = true;
  for (size_t q = 0; q < idxs.size(); q++)
    if (idxs[q] != q) {
      already_front = false;
      break;
    }
  if (idxs.empty() || already_front) return false;
  insert_rows(s, mk, 0, extract_rows(s, mk, idxs));
  return true;
}

// HarfBuzz merges clusters across a reordered syllable
void merge_syllable_clusters(ShapeOut &s) {
  if (s.cl.empty()) return;
  uint32_t lo = s.cl[0], hi = s.cle[0];
  for (size_t k = 1; k < s.cl.size(); k++) {
    if (s.cl[k] < lo) lo = s.cl[k];
    if (s.cle[k] > hi) hi = s.cle[k];
  }
  for (size_t k = 0; k < s.cl.size(); k++) {
    s.cl[k] = lo;
    s.cle[k] = hi;
  }
}

// shaper._shape_indic_syllable: masked basic stages, reorder (pre-base
// matra to front, reph to the after-post slot), merged clusters, then the
// presentation features
void shape_indic_syllable(const FdFontPack *pk, const uint32_t *cps_syl,
                          size_t sn, size_t src_off, ShapeOut &s) {
  long base;
  bool has_reph;
  indic::analyze(cps_syl, sn, &base, &has_reph);
  Masks mk;
  indic::build_masks(cps_syl, sn, base, has_reph, mk);
  // identities that survive GSUB: the (start, end) source clusters
  ClRange reph_cluster{0, 0};
  if (has_reph)
    reph_cluster = {(uint32_t)src_off, (uint32_t)(src_off + 2)};
  std::vector<ClRange> matra_clusters;
  std::vector<ClRange> sm_clusters;
  for (size_t k = 0; k < sn; k++) {
    int cat = indic::category(cps_syl[k]);
    if (cat == indic::C_MATRA_PRE)
      matra_clusters.push_back(
          {(uint32_t)(src_off + k), (uint32_t)(src_off + k + 1)});
    if (cat == indic::C_SM || cat == indic::C_VEDIC)
      sm_clusters.push_back(
          {(uint32_t)(src_off + k), (uint32_t)(src_off + k + 1)});
  }
  static const uint16_t reqs[8] = {0,      M_RPHF, 0,      M_PREF,
                                   M_BLWF, M_HALF, M_PSTF, 0};
  for (int t = 0; t < 8; t++)
    apply_sub_plan(pk, pk->syl_plans[SP_INDIC + t], s, &mk, reqs[t]);
  bool moved = false;
  // pre-base matra (i) moves to the front of the syllable
  for (const ClRange &mc : matra_clusters) {
    for (size_t k = 0; k < s.cl.size(); k++) {
      if (s.cl[k] == mc.first && s.cle[k] == mc.second) {
        if (k != 0) {
          insert_rows(s, mk, 0, extract_rows(s, mk, {k}));
          moved = true;
        }
        break;
      }
    }
  }
  // reph moves to the after-post slot: syllable end, before syllable
  // modifiers (anusvara & co) — REPH_POS_AFTER_POST
  if (has_reph) {
    long idx = -1;
    for (size_t k = 0; k < s.cl.size(); k++)
      if (s.cl[k] == reph_cluster.first && s.cle[k] == reph_cluster.second) {
        idx = (long)k;
        break;
      }
    if (idx >= 0) {
      size_t tgt = s.g.size();
      auto in_sm = [&](size_t k) {
        for (const ClRange &c : sm_clusters)
          if (s.cl[k] == c.first && s.cle[k] == c.second) return true;
        return false;
      };
      while ((long)tgt - 1 > idx && in_sm(tgt - 1)) tgt--;
      if ((long)tgt - 1 > idx) {
        // tgt was found pre-extract; tgt-1 is the same slot post-extract
        // (the extracted row sat below it)
        insert_rows(s, mk, tgt - 1, extract_rows(s, mk, {(size_t)idx}));
        moved = true;
      }
    }
  }
  if (moved) merge_syllable_clusters(s);
  apply_sub_plan(pk, pk->syl_plans[SP_INDIC + 8], s, &mk, 0);  // presentation
}

// shaper._shape_khmer_syllable
void shape_khmer_syllable(const FdFontPack *pk, const uint32_t *cps_syl,
                          size_t sn, size_t src_off, ShapeOut &s) {
  Masks mk;
  usekm::khmer_masks(cps_syl, sn, mk);
  std::vector<ClRange> vpre, pref;
  for (size_t k = 0; k < sn; k++) {
    if (usekm::kh_vpre(cps_syl[k]))
      vpre.push_back({(uint32_t)(src_off + k), (uint32_t)(src_off + k + 1)});
    else if (cps_syl[k] == usekm::KH_COENG && k + 1 < sn &&
             cps_syl[k + 1] == usekm::KH_RO)
      pref.push_back({(uint32_t)(src_off + k), (uint32_t)(src_off + k + 2)});
  }
  static const uint16_t reqs[6] = {0,      M_PREF, M_BLWF,
                                   M_ABVF, M_PSTF, M_CFAR};
  for (int t = 0; t < 6; t++)
    apply_sub_plan(pk, pk->syl_plans[SP_KHMER + t], s, &mk, reqs[t]);
  bool moved = move_to_front(s, mk, pref);
  moved |= move_to_front(s, mk, vpre);
  if (moved) merge_syllable_clusters(s);
  apply_sub_plan(pk, pk->syl_plans[SP_USE_PRES], s, &mk, 0);
}

// shaper._shape_myanmar_syllable
void shape_myanmar_syllable(const FdFontPack *pk, const uint32_t *cps_syl,
                            size_t sn, size_t src_off, ShapeOut &s) {
  bool has_kinzi = usekm::my_has_kinzi(cps_syl, sn, 0);
  Masks mk;
  usekm::myanmar_masks(cps_syl, sn, has_kinzi, mk);
  std::vector<ClRange> vpre, medra;
  for (size_t k = 0; k < sn; k++) {
    if (cps_syl[k] == usekm::MY_VPRE)
      vpre.push_back({(uint32_t)(src_off + k), (uint32_t)(src_off + k + 1)});
    else if (cps_syl[k] == usekm::MY_MED_RA)
      medra.push_back({(uint32_t)(src_off + k), (uint32_t)(src_off + k + 1)});
  }
  ClRange kinzi{0, 0};
  if (has_kinzi) kinzi = {(uint32_t)src_off, (uint32_t)(src_off + 3)};
  size_t base_end_idx = usekm::myanmar_base_cluster_end(cps_syl, sn,
                                                        has_kinzi);
  // source offset one past the base cluster, captured BEFORE GSUB mutates
  // the cluster list
  uint32_t boundary = base_end_idx < sn
                          ? (uint32_t)(src_off + base_end_idx)
                          : (uint32_t)(src_off + sn);
  static const uint16_t reqs[5] = {0, M_RPHF, M_PREF, M_BLWF, M_PSTF};
  for (int t = 0; t < 5; t++)
    apply_sub_plan(pk, pk->syl_plans[SP_MYANMAR + t], s, &mk, reqs[t]);
  bool moved = false;
  if (has_kinzi) {
    std::vector<size_t> kidx;
    for (size_t k = 0; k < s.cl.size(); k++)
      if (s.cl[k] >= kinzi.first && s.cle[k] <= kinzi.second)
        kidx.push_back(k);
    if (!kidx.empty()) {
      std::vector<SylRow> items = extract_rows(s, mk, kidx);
      size_t tgt = 0;  // post-extract: one past the base cluster
      for (size_t k = 0; k < s.cl.size(); k++)
        if (s.cl[k] < boundary) tgt = k + 1;
      insert_rows(s, mk, tgt, items);
      moved = true;
    }
  }
  moved |= move_to_front(s, mk, medra);
  moved |= move_to_front(s, mk, vpre);
  if (moved) merge_syllable_clusters(s);
  apply_sub_plan(pk, pk->syl_plans[SP_USE_PRES], s, &mk, 0);
}

// shaper._substitute_indic: Devanagari syllables through the staged engine,
// non-Devanagari stretches through the generic default plan (per-slice, so
// context matching never crosses a segment boundary — Python slices too)
void shape_indic_run(const FdFontPack *pk, const uint32_t *cps, size_t n,
                     ShapeOut &out) {
  size_t i = 0;
  while (i < n) {
    ShapeOut s;
    size_t j;
    if (indic::is_deva(cps[i])) {
      j = indic::next_syllable(cps, n, i);
      init_subrun(pk, cps, i, j, s);
      shape_indic_syllable(pk, cps + i, j - i, i, s);
    } else {
      j = i;
      while (j < n && !indic::is_deva(cps[j])) j++;
      init_subrun(pk, cps, i, j, s);
      apply_sub_plan(pk, pk->sub_plan, s, nullptr, 0);
    }
    append_run(out, s);
    i = j;
  }
}

// shaper._substitute_use
void shape_use_run(const FdFontPack *pk, const uint32_t *cps, size_t n,
                   ShapeOut &out) {
  size_t i = 0;
  while (i < n) {
    ShapeOut s;
    size_t j;
    if (usekm::is_khmer(cps[i])) {
      j = usekm::khmer_next_syllable(cps, n, i);
      init_subrun(pk, cps, i, j, s);
      shape_khmer_syllable(pk, cps + i, j - i, i, s);
    } else if (usekm::is_myanmar(cps[i])) {
      j = usekm::myanmar_next_syllable(cps, n, i);
      init_subrun(pk, cps, i, j, s);
      shape_myanmar_syllable(pk, cps + i, j - i, i, s);
    } else {
      j = i;
      while (j < n &&
             !(usekm::is_khmer(cps[j]) || usekm::is_myanmar(cps[j])))
        j++;
      init_subrun(pk, cps, i, j, s);
      apply_sub_plan(pk, pk->sub_plan, s, nullptr, 0);
    }
    append_run(out, s);
    i = j;
  }
}

// cmap + Thai preprocess + the GSUB plan (in plan order) for generic runs;
// Arabic-script runs take the staged masked pipeline
// (shaper._substitute_arabic): ccmp+locl riding the masks, one masked
// stage per positional feature in joining-analysis order, then rlig and
// the remaining common features unmasked (masks still threaded so tags
// survive decomposition/ligation)
int32_t shape_core(const FdFontPack *pk, const uint32_t *cps, int32_t n,
                   ShapeOut &out) {
  if (n < 0) return FD_TYPESET_E_CAP;
  if ((pk->flags & FD_PACK_FEATURES_REDUCED) && !pk->allow_reduced)
    return FD_TYPESET_E_REDUCED;
  bool has_am = false, has_arabic = false, has_indic = false,
       has_use = false;
  for (int32_t k = 0; k < n; k++) {
    if (arabic_script_cp(cps[k])) has_arabic = true;
    if (indic_script_cp(cps[k])) has_indic = true;
    if (use_script_cp(cps[k])) has_use = true;
    if (cps[k] == 0x0E33 || cps[k] == 0x0EB3) has_am = true;
  }
  // routing mirrors substitute_ex's elif chain (shaper.py:631-640): any
  // Arabic routes the WHOLE run through the Arabic stages (non-Arabic
  // positions carry no positional tag); else any Devanagari routes through
  // the Indic syllable engine; else Khmer/Myanmar through the USE engine;
  // else Thai gets its SARA AM preprocess before the generic plan
  if (has_arabic) {
    if ((pk->flags & FD_PACK_ARABIC_REDUCED) && !pk->allow_reduced)
      return FD_TYPESET_E_REDUCED;
    std::vector<uint32_t> cpv(cps, cps + n);
    size_t m = cpv.size();
    out.g.resize(m);
    out.cl.resize(m);
    out.cle.resize(m);
    out.comps.assign(m, {1, -1});
    for (size_t k = 0; k < m; k++) {
      out.g[k] = (uint16_t)fd_pack_glyph_id(pk, cpv[k]);
      out.cl[k] = (uint32_t)k;
      out.cle[k] = (uint32_t)k + 1;
    }
    Masks mk;
    arabic_masks(pk, cpv, mk);
    apply_sub_plan(pk, pk->arab_plans[0], out, &mk, 0);  // ccmp + locl
    static const uint16_t stage_bits[4] = {M_ISOL, M_FINA, M_MEDI, M_INIT};
    for (int t = 0; t < 4; t++)
      apply_sub_plan(pk, pk->arab_plans[1 + t], out, &mk, stage_bits[t]);
    apply_sub_plan(pk, pk->arab_plans[5], out, &mk, 0);  // rlig
    apply_sub_plan(pk, pk->arab_plans[6], out, &mk, 0);  // liga/clig/calt/rclt
    return (int32_t)out.g.size();
  }
  if (has_indic || has_use) {
    if ((pk->flags & FD_PACK_SYLLABLE_REDUCED) && !pk->allow_reduced)
      return FD_TYPESET_E_REDUCED;
    std::vector<uint32_t> cpv(cps, cps + n);
    if (has_indic)
      shape_indic_run(pk, cpv.data(), cpv.size(), out);
    else
      shape_use_run(pk, cpv.data(), cpv.size(), out);
    return (int32_t)out.g.size();
  }
  std::vector<uint32_t> cpv(cps, cps + n);
  std::vector<uint32_t> clv((size_t)n), clev((size_t)n);
  for (int32_t k = 0; k < n; k++) {
    clv[k] = (uint32_t)k;
    clev[k] = (uint32_t)k + 1;
  }
  if (has_am) thai_preprocess(pk, cpv, clv, clev);
  size_t m = cpv.size();
  out.g.resize(m);
  out.cl = std::move(clv);
  out.cle = std::move(clev);
  out.comps.assign(m, {1, -1});
  for (size_t k = 0; k < m; k++)
    out.g[k] = (uint16_t)fd_pack_glyph_id(pk, cpv[k]);
  apply_sub_plan(pk, pk->sub_plan, out, nullptr, 0);
  return (int32_t)out.g.size();
}

inline bool is_attach_mark(const FdFontPack *pk, uint16_t g) {
  return g < pk->gdef.size() && (pk->gdef[g] & kMarkBit);
}

// GPOS 4/5/6 anchor queries — shaper.mark_attach / mark_attach_ligature /
// mark_attach_mark (first table with both records wins, y-up font units)
bool mark_attach(const FdFontPack *pk, uint16_t base, uint16_t mark,
                 double *dx, double *dy) {
  for (const MarkBaseTable &t : pk->mark_base) {
    auto mit = t.marks.find(mark);
    if (mit == t.marks.end()) continue;
    auto bit = t.bases.find(base);
    if (bit == t.bases.end()) continue;
    auto ait = bit->second.find(mit->second.cls);
    if (ait == bit->second.end()) continue;
    *dx = ait->second.first - mit->second.mx;
    *dy = ait->second.second - mit->second.my;
    return true;
  }
  return false;
}

bool mark_attach_lig(const FdFontPack *pk, uint16_t lig, uint16_t mark,
                     int comp, double *dx, double *dy) {
  for (const MarkLigTable &t : pk->mark_lig) {
    auto mit = t.marks.find(mark);
    if (mit == t.marks.end()) continue;
    auto lit = t.ligs.find(lig);
    if (lit == t.ligs.end() || lit->second.empty()) continue;
    size_t ci = comp >= 0 ? (size_t)comp : lit->second.size() - 1;
    if (ci >= lit->second.size()) ci = lit->second.size() - 1;
    const AnchorSet &as = lit->second[ci];
    auto ait = as.find(mit->second.cls);
    if (ait == as.end()) continue;
    *dx = ait->second.first - mit->second.mx;
    *dy = ait->second.second - mit->second.my;
    return true;
  }
  return false;
}

bool mark_attach_mark2(const FdFontPack *pk, uint16_t mark2, uint16_t mark1,
                       double *dx, double *dy) {
  for (const MarkBaseTable &t : pk->mark_mark) {
    auto mit = t.marks.find(mark1);
    if (mit == t.marks.end()) continue;
    auto bit = t.bases.find(mark2);
    if (bit == t.bases.end()) continue;
    auto ait = bit->second.find(mit->second.cls);
    if (ait == bit->second.end()) continue;
    *dx = ait->second.first - mit->second.mx;
    *dy = ait->second.second - mit->second.my;
    return true;
  }
  return false;
}

struct PosOut {
  std::vector<double> adv;     // font units (kern + cursive folded)
  std::vector<double> dx, dy;  // per-glyph offsets, font units, y-UP
  std::vector<uint8_t> attached;
};

// the positioning half of layout.py's segment loop (:660-752): GPOS kern
// deltas, the cursive chain, then the base/mark attach sweep. rtl selects
// the mark-offset convention (the visual reversal parks a mark's cursor at
// its base's origin — no pen pullback).
// seg_levels (may be null): per segment-input-index UAX#9 embedding
// levels — per-GLYPH rtl then comes from the glyph's cluster start
// (layout.py's is_rtl = levels[cs] % 2), overriding the run-wide flag.
void position_core(const FdFontPack *pk, const ShapeOut &s, bool rtl,
                   PosOut &p, const int32_t *seg_levels = nullptr) {
  size_t n = s.g.size();
  p.adv.assign(n, 0.0);
  p.dx.assign(n, 0.0);
  p.dy.assign(n, 0.0);
  p.attached.assign(n, 0);

  std::vector<int32_t> deltas(n, 0);
  bool use_gpos = (pk->flags & FD_PACK_HAS_GPOS_KERN) != 0;
  if (use_gpos) {
    for (uint32_t pi : pk->pos_plan) {
      const Lookup &L = pk->gpos[pi];
      if (L.entries.empty()) continue;
      size_t i = 0;
      while (i < n) {
        if (skipped(pk, L, s.g[i])) {
          i++;
          continue;
        }
        long nxt = -1;
        for (const Entry &e : L.entries) {
          nxt = try_pos_entry(pk, L, e, s.g, deltas, i);
          if (nxt >= 0) break;
        }
        i = (nxt >= 0 && (size_t)nxt > i) ? (size_t)nxt : i + 1;
      }
    }
  }

  // GPOS 3 cursive chain (shaper.cursive_chain): exit_i meets entry_{i+1}
  std::vector<uint8_t> has_cadv(n, 0);
  std::vector<double> cadv(n, 0.0), cdy(n, 0.0);
  if (!pk->cursive.empty()) {
    double cur_dy = 0.0;
    long prev = -1;
    CursRow pexit{};
    for (size_t i = 0; i < n; i++) {
      const CursRow *rec = nullptr;
      for (const auto &table : pk->cursive) {
        auto it = table.find(s.g[i]);
        if (it != table.end()) {
          rec = &it->second;
          break;
        }
      }
      if (rec == nullptr) {
        prev = -1;
        cur_dy = 0.0;
        continue;
      }
      if (prev >= 0 && (rec->flags & 1)) {
        cadv[(size_t)prev] = (double)pexit.xx - rec->ex;
        has_cadv[(size_t)prev] = 1;
        cur_dy += (double)pexit.xy - rec->ey;
        cdy[i] = cur_dy;
      } else {
        cur_dy = 0.0;
      }
      if (rec->flags & 2) {
        prev = (long)i;
        pexit = *rec;
      } else {
        prev = -1;
      }
    }
  }

  long base = -1;
  uint16_t base_gid = 0;
  int base_lig = 1;
  double pen_since_base = 0.0;
  long prev_mark = -1;
  long last_pen = -1;  // previous pen glyph: legacy kern pair left glyph
                       // AND the advance the kern value lands on
  for (size_t k = 0; k < n; k++) {
    uint16_t gid = s.g[k];
    double adv = gid < pk->advances.size() ? pk->advances[gid] : 0.0;
    bool attach = false;
    double ax = 0.0, ay = 0.0;
    if (is_attach_mark(pk, gid)) {
      double ddx, ddy;
      if (prev_mark >= 0 &&
          mark_attach_mark2(pk, s.g[(size_t)prev_mark], gid, &ddx, &ddy)) {
        ax = p.dx[(size_t)prev_mark] + ddx;
        ay = p.dy[(size_t)prev_mark] + ddy;
        attach = true;
      }
      if (!attach && base >= 0) {
        bool found = false;
        if (base_lig > 1)
          found = mark_attach_lig(pk, base_gid, gid, s.comps[k].second,
                                  &ddx, &ddy);
        if (!found) found = mark_attach(pk, base_gid, gid, &ddx, &ddy);
        if (found) {
          bool g_rtl =
              seg_levels ? (seg_levels[s.cl[k]] % 2 == 1) : rtl;
          ax = ddx - (g_rtl ? 0.0 : pen_since_base);
          ay = ddy;
          attach = true;
        }
      }
    }
    double curs_dy = 0.0;
    if (has_cadv[k]) adv = cadv[k];
    curs_dy = cdy[k];
    if (use_gpos) {
      if (!attach && deltas[k]) adv += (double)deltas[k];
    } else if (!attach && last_pen >= 0 && !pk->kern0.empty()) {
      // the legacy 'kern' value lands on the previous pen glyph's advance
      // (layout.py:726-733). No pen_since_base update: this glyph is
      // non-attached and becomes the new base below, resetting it before
      // any mark reads it (layout.py agrees)
      double kv = kern0_lookup(pk, s.g[(size_t)last_pen], gid);
      if (kv != 0.0) p.adv[(size_t)last_pen] += kv;
    }
    p.adv[k] = attach ? 0.0 : adv;
    p.dx[k] = attach ? ax : 0.0;
    p.dy[k] = attach ? ay : curs_dy;
    p.attached[k] = attach ? 1 : 0;
    if (attach) {
      prev_mark = (long)k;
    } else {
      base = (long)k;
      base_gid = gid;
      base_lig = s.comps[k].first;
      last_pen = (long)k;
      pen_since_base = adv;
      prev_mark = -1;
    }
  }
}

// ======== UAX#9 bidi (text/bidi.py, line-for-line) ============================
// Class codes are BIDI_CLASSES order (native_pack.py); the per-codepoint
// table and the mirrored property ride the pack (the builder's exact
// unicodedata), MIRROR_PAIRS is bidi.py's own static table.

namespace bidi {

enum : int32_t {
  B_L = 0, B_R, B_AL, B_EN, B_ES, B_ET, B_AN, B_CS, B_NSM, B_BN,
  B_B, B_S, B_WS, B_ON, B_LRE, B_RLE, B_LRO, B_RLO, B_PDF,
  B_LRI, B_RLI, B_FSI, B_PDI
};
constexpr int32_t kMaxDepth = 125;

inline bool iso_init(int32_t t) {
  return t == B_LRI || t == B_RLI || t == B_FSI;
}
inline bool is_ni(int32_t t) {  // neutrals/isolates (_NI)
  return t == B_B || t == B_S || t == B_WS || t == B_ON || iso_init(t) ||
         t == B_PDI;
}

int32_t char_type(const FdFontPack *pk, uint32_t cp) {
  const auto &v = pk->bidi_cls;
  size_t lo = 0, hi = v.size();
  while (lo < hi) {
    size_t mid = (lo + hi) / 2;
    if (cp < v[mid].start)
      hi = mid;
    else if (cp >= v[mid].end)
      lo = mid + 1;
    else
      return (int32_t)v[mid].cls;
  }
  return B_L;  // char_type's `or "L"` default
}

uint32_t mirror_cp(const FdFontPack *pk, uint32_t cp) {
  const auto &v = pk->mirrored;
  size_t lo = 0, hi = v.size();
  bool m = false;
  while (lo < hi) {
    size_t mid = (lo + hi) / 2;
    if (cp < v[mid].first)
      hi = mid;
    else if (cp >= v[mid].second)
      lo = mid + 1;
    else {
      m = true;
      break;
    }
  }
  if (!m) return cp;
  switch (cp) {  // bidi.MIRROR_PAIRS
    case 0x28: return 0x29;
    case 0x29: return 0x28;
    case 0x5B: return 0x5D;
    case 0x5D: return 0x5B;
    case 0x7B: return 0x7D;
    case 0x7D: return 0x7B;
    case 0x3C: return 0x3E;
    case 0x3E: return 0x3C;
    case 0xAB: return 0xBB;
    case 0xBB: return 0xAB;
    case 0x2039: return 0x203A;
    case 0x203A: return 0x2039;
    case 0x27E8: return 0x27E9;
    case 0x27E9: return 0x27E8;
    case 0x2308: return 0x2309;
    case 0x2309: return 0x2308;
    case 0x230A: return 0x230B;
    case 0x230B: return 0x230A;
    case 0x2264: return 0x2265;
    case 0x2265: return 0x2264;
    default: return cp;  // mirrored but unpaired in the table
  }
}

// P2/P3: first strong type outside isolates
int32_t paragraph_level(const int32_t *types, size_t n) {
  int isolate = 0;
  for (size_t i = 0; i < n; i++) {
    int32_t t = types[i];
    if (iso_init(t))
      isolate++;
    else if (t == B_PDI) {
      if (isolate > 0) isolate--;
    } else if (isolate == 0) {
      if (t == B_L) return 0;
      if (t == B_R || t == B_AL) return 1;
    }
  }
  return 0;
}

// BD9
size_t matching_pdi(const int32_t *types, size_t n, size_t i) {
  int depth = 1;
  for (size_t j = i + 1; j < n; j++) {
    if (iso_init(types[j]))
      depth++;
    else if (types[j] == B_PDI && --depth == 0)
      return j;
  }
  return n;
}

// X1-X8/X5a-X6a + W1-W7 + N1-N2 + I1-I2 for one paragraph; types is the
// working copy (mutated exactly like bidi.resolve_levels)
int32_t resolve_levels(std::vector<int32_t> &types,
                       std::vector<int32_t> &levels) {
  size_t n = types.size();
  std::vector<int32_t> orig(types);
  int32_t para = paragraph_level(types.data(), n);
  levels.assign(n, para);

  struct StackEnt {
    int32_t level, override_t;  // override: B_L/B_R or -1
    bool isolate;
  };
  std::vector<StackEnt> stack{{para, -1, false}};
  int overflow_isolates = 0, overflow_embedding = 0, valid_isolates = 0;
  auto next_odd = [](int32_t l) { return l % 2 == 0 ? l + 1 : l + 2; };
  auto next_even = [](int32_t l) { return l % 2 == 0 ? l + 2 : l + 1; };

  for (size_t i = 0; i < n; i++) {
    int32_t t = types[i];
    if (t == B_RLE || t == B_LRE || t == B_RLO || t == B_LRO) {
      int32_t nl = (t == B_RLE || t == B_RLO) ? next_odd(stack.back().level)
                                              : next_even(stack.back().level);
      levels[i] = stack.back().level;
      types[i] = B_BN;
      if (nl <= kMaxDepth && !overflow_isolates && !overflow_embedding)
        stack.push_back(
            {nl, t == B_RLO ? B_R : (t == B_LRO ? B_L : -1), false});
      else if (!overflow_isolates)
        overflow_embedding++;
    } else if (t == B_PDF) {
      levels[i] = stack.back().level;
      types[i] = B_BN;
      if (overflow_isolates) {
      } else if (overflow_embedding) {
        overflow_embedding--;
      } else if (!stack.back().isolate && stack.size() > 1) {
        stack.pop_back();
      }
    } else if (iso_init(t)) {
      if (t == B_FSI) {
        size_t end = matching_pdi(types.data(), n, i);
        t = paragraph_level(orig.data() + i + 1,
                            end > i + 1 ? end - (i + 1) : 0) == 1
                ? B_RLI
                : B_LRI;
      }
      levels[i] = stack.back().level;
      if (stack.back().override_t >= 0) types[i] = stack.back().override_t;
      int32_t nl = t == B_RLI ? next_odd(stack.back().level)
                              : next_even(stack.back().level);
      if (nl <= kMaxDepth && !overflow_isolates && !overflow_embedding) {
        valid_isolates++;
        stack.push_back({nl, -1, true});
      } else {
        overflow_isolates++;
      }
    } else if (t == B_PDI) {
      if (overflow_isolates) {
        overflow_isolates--;
      } else if (valid_isolates) {
        overflow_embedding = 0;
        while (!stack.back().isolate) stack.pop_back();
        stack.pop_back();
        valid_isolates--;
      }
      levels[i] = stack.back().level;
      if (stack.back().override_t >= 0) types[i] = stack.back().override_t;
    } else if (t == B_B) {
      levels[i] = para;
    } else {
      levels[i] = stack.back().level;
      if (stack.back().override_t >= 0) types[i] = stack.back().override_t;
    }
  }

  // level runs with sos/eos (X10, the 6.2 run model)
  std::vector<size_t> visible;
  for (size_t j = 0; j < n; j++)
    if (types[j] != B_BN) visible.push_back(j);
  std::vector<std::pair<size_t, size_t>> runs;  // [start, end)
  if (!visible.empty()) {
    size_t vs = visible[0];
    for (size_t q = 0; q + 1 < visible.size(); q++) {
      size_t a = visible[q], b = visible[q + 1];
      if (levels[b] != levels[a]) {
        runs.emplace_back(vs, a + 1);
        vs = b;
      }
    }
    runs.emplace_back(vs, visible.back() + 1);
  }

  for (size_t ri = 0; ri < runs.size(); ri++) {
    auto [rs, re] = runs[ri];
    int32_t run_level = levels[rs];
    int32_t prev_level = ri > 0 ? levels[runs[ri - 1].first] : para;
    int32_t next_level = ri + 1 < runs.size() ? levels[runs[ri + 1].first]
                                              : para;
    int32_t sos = (std::max(run_level, prev_level) % 2) ? B_R : B_L;
    int32_t eos = (std::max(run_level, next_level) % 2) ? B_R : B_L;
    std::vector<size_t> idxs;
    for (size_t j = rs; j < re; j++)
      if (types[j] != B_BN) idxs.push_back(j);

    // W1 (isolate initiators / PDI before an NSM give ON)
    int32_t prev_t = sos;
    for (size_t j : idxs) {
      if (types[j] == B_NSM)
        types[j] = (iso_init(prev_t) || prev_t == B_PDI) ? B_ON : prev_t;
      prev_t = types[j];
    }
    // W2
    int32_t strong = sos;
    for (size_t j : idxs) {
      int32_t t = types[j];
      if (t == B_L || t == B_R || t == B_AL)
        strong = t;
      else if (t == B_EN && strong == B_AL)
        types[j] = B_AN;
    }
    // W3
    for (size_t j : idxs)
      if (types[j] == B_AL) types[j] = B_R;
    // W4
    for (size_t k = 1; k + 1 < idxs.size(); k++) {
      size_t j = idxs[k];
      int32_t a = types[idxs[k - 1]], b = types[idxs[k + 1]];
      if (types[j] == B_ES && a == B_EN && b == B_EN)
        types[j] = B_EN;
      else if (types[j] == B_CS && a == b && (a == B_EN || a == B_AN))
        types[j] = a;
    }
    // W5
    for (size_t k = 0; k < idxs.size();) {
      if (types[idxs[k]] == B_ET) {
        size_t k2 = k;
        while (k2 < idxs.size() && types[idxs[k2]] == B_ET) k2++;
        int32_t before = k > 0 ? types[idxs[k - 1]] : sos;
        int32_t after = k2 < idxs.size() ? types[idxs[k2]] : eos;
        if (before == B_EN || after == B_EN)
          for (size_t m = k; m < k2; m++) types[idxs[m]] = B_EN;
        k = k2;
      } else {
        k++;
      }
    }
    // W6
    for (size_t j : idxs)
      if (types[j] == B_ET || types[j] == B_ES || types[j] == B_CS)
        types[j] = B_ON;
    // W7
    strong = sos;
    for (size_t j : idxs) {
      int32_t t = types[j];
      if (t == B_L || t == B_R)
        strong = t;
      else if (t == B_EN && strong == B_L)
        types[j] = B_L;
    }

    // N1/N2
    auto n_side = [](int32_t t) -> int32_t {
      if (t == B_R || t == B_EN || t == B_AN) return B_R;
      if (t == B_L) return B_L;
      return -1;
    };
    for (size_t k = 0; k < idxs.size();) {
      if (is_ni(types[idxs[k]])) {
        size_t k2 = k;
        while (k2 < idxs.size() && is_ni(types[idxs[k2]])) k2++;
        int32_t before = k > 0 ? n_side(types[idxs[k - 1]]) : sos;
        int32_t after = k2 < idxs.size() ? n_side(types[idxs[k2]]) : eos;
        int32_t res;
        if (before == after && (before == B_L || before == B_R))
          res = before;
        else
          res = (run_level % 2) ? B_R : B_L;  // N2
        for (size_t m = k; m < k2; m++) types[idxs[m]] = res;
        k = k2;
      } else {
        k++;
      }
    }

    // I1/I2
    for (size_t j : idxs) {
      int32_t t = types[j];
      if (run_level % 2 == 0) {
        if (t == B_R)
          levels[j] = run_level + 1;
        else if (t == B_AN || t == B_EN)
          levels[j] = run_level + 2;
      } else {
        if (t == B_L || t == B_AN || t == B_EN) levels[j] = run_level + 1;
      }
    }
  }

  // X9 cleanup
  for (long j = (long)n - 2; j >= 0; j--)
    if (types[j] == B_BN) levels[j] = levels[j + 1];
  return para;
}

// compute_levels over a multi-paragraph text: levels + per-char paragraph
// base levels; paragraphs split on class B, the separator ending its own
void compute_levels(const FdFontPack *pk, const uint32_t *cps, size_t n,
                    std::vector<int32_t> &levels, std::vector<int32_t> &bases) {
  levels.clear();
  bases.clear();
  size_t start = 0;
  std::vector<int32_t> orig_types(n);
  for (size_t i = 0; i < n; i++) orig_types[i] = char_type(pk, cps[i]);
  auto run_para = [&](size_t s, size_t e) {
    std::vector<int32_t> t(orig_types.begin() + s, orig_types.begin() + e);
    std::vector<int32_t> lv;
    int32_t para = resolve_levels(t, lv);
    levels.insert(levels.end(), lv.begin(), lv.end());
    bases.insert(bases.end(), e - s, para);
  };
  for (size_t i = 0; i < n; i++) {
    if (orig_types[i] == B_B) {
      run_para(start, i + 1);
      start = i + 1;
    }
  }
  if (start < n || n == 0) run_para(start, n);
}

// L1 + L2 for one line (logical-order slices); returns logical indices in
// visual order
std::vector<size_t> line_visual_order(const std::vector<int32_t> &levels,
                                      const std::vector<int32_t> &types,
                                      int32_t para_level) {
  size_t n = levels.size();
  std::vector<int32_t> lv(levels);
  auto resettable = [](int32_t t) {
    return t == B_WS || iso_init(t) || t == B_PDI || t == B_BN;
  };
  for (size_t i = 0; i < n; i++) {
    if (types[i] == B_S || types[i] == B_B) {
      lv[i] = para_level;
      for (long j = (long)i - 1; j >= 0 && resettable(types[j]); j--)
        lv[j] = para_level;
    }
  }
  for (long j = (long)n - 1; j >= 0 && resettable(types[j]); j--)
    lv[j] = para_level;

  std::vector<size_t> order(n);
  for (size_t i = 0; i < n; i++) order[i] = i;
  if (n == 0) return order;
  int32_t max_level = *std::max_element(lv.begin(), lv.end());
  int32_t min_odd = max_level + 1;
  for (int32_t l : lv)
    if (l % 2 && l < min_odd) min_odd = l;
  for (int32_t level = max_level; level >= min_odd; level--) {
    size_t i = 0;
    while (i < n) {
      if (lv[i] >= level) {
        size_t j = i;
        while (j < n && lv[j] >= level) j++;
        std::reverse(order.begin() + i, order.begin() + j);
        i = j;
      } else {
        i++;
      }
    }
  }
  return order;
}

}  // namespace bidi

}  // namespace

int32_t fd_typeset_shape(const FdFontPack *pack, const uint32_t *cps,
                         int32_t n, uint32_t *gids, float *advances,
                         uint32_t *clusters, int32_t cap) {
  ShapeOut s;
  int32_t count = shape_core(pack, cps, n, s);
  if (count < 0) return count;
  // the offset-less advance-stream API cannot express mark placement —
  // refuse attach-capable marks (fd_typeset_shape_ex / fd_typeset_box
  // position them via per-glyph offsets)
  for (uint16_t gg : s.g)
    if (is_attach_mark(pack, gg)) return FD_TYPESET_E_MARKS;
  if (count > cap) return FD_TYPESET_E_CAP;
  PosOut p;
  position_core(pack, s, false, p);
  // refusal, not degradation: GPOS cursive entry/exit chains can produce
  // nonzero vertical offsets that an advance stream cannot carry — emitting
  // the cursive-adjusted advances on a flat baseline would be silently
  // wrong joins (fd_typeset_shape_ex exposes the dy channel)
  for (int32_t k = 0; k < count; k++)
    if (p.dy[(size_t)k] != 0.0) return FD_TYPESET_E_OFFSETS;
  for (int32_t k = 0; k < count; k++) {
    if (gids) gids[k] = s.g[k];
    if (clusters) clusters[k] = s.cl[k];
    if (advances) advances[k] = (float)p.adv[k];
  }
  return count;
}

int32_t fd_typeset_shape_ex(const FdFontPack *pack, const uint32_t *cps,
                            int32_t n, int32_t rtl, uint32_t *gids,
                            float *advances, float *dx, float *dy,
                            uint32_t *clusters, int32_t cap) {
  ShapeOut s;
  int32_t count = shape_core(pack, cps, n, s);
  if (count < 0) return count;
  if (count > cap) return FD_TYPESET_E_CAP;
  PosOut p;
  position_core(pack, s, rtl != 0, p);
  for (int32_t k = 0; k < count; k++) {
    if (gids) gids[k] = s.g[k];
    if (clusters) clusters[k] = s.cl[k];
    if (advances) advances[k] = (float)p.adv[k];
    if (dx) dx[k] = (float)p.dx[k];
    if (dy) dy[k] = (float)p.dy[k];
  }
  return count;
}

int32_t fd_typeset_line(const FdFontPack *pack, const uint32_t *cps,
                        int32_t n, float size_px, uint32_t *gids, float *xs,
                        uint32_t *clusters, int32_t cap, float *baseline) {
  // shape into internal buffers: the shaped count is only known afterwards
  // (GSUB multiple substitution can EXPAND the run), so writing straight
  // into the caller's cap-sized arrays would overflow them before the cap
  // check — the caller sees its buffers touched only up to cap
  std::vector<float> adv((size_t)(n > 0 ? n * 2 : 16));
  std::vector<uint32_t> g(adv.size()), cl(adv.size());
  int32_t count = fd_typeset_shape(pack, cps, n, g.data(), adv.data(),
                                   cl.data(), (int32_t)adv.size());
  while (count == FD_TYPESET_E_CAP && adv.size() < (1u << 24)) {
    adv.resize(adv.size() * 2);
    g.resize(adv.size());
    cl.resize(adv.size());
    count = fd_typeset_shape(pack, cps, n, g.data(), adv.data(), cl.data(),
                             (int32_t)adv.size());
  }
  if (count < 0) return count;
  if (count > cap) return FD_TYPESET_E_CAP;
  if (gids) std::memcpy(gids, g.data(), (size_t)count * sizeof(uint32_t));
  if (clusters)
    std::memcpy(clusters, cl.data(), (size_t)count * sizeof(uint32_t));
  double scale = pack->upem > 0 ? (double)size_px / pack->upem : 0.0;
  if (xs) {
    double pen = 0.0;
    for (int32_t k = 0; k < count; k++) {
      xs[k] = (float)pen;
      pen += adv[k] * scale;
    }
  }
  if (baseline) {
    // round(ascent + lineGap/2) at scale — pixie.nim:41-42 via layout.py:495;
    // nearbyint matches Python round's half-to-even
    *baseline =
        (float)std::nearbyint(pack->ascent * scale + pack->line_gap * scale * 0.5);
  }
  return count;
}

namespace {

// Python str.isspace() over the codepoints layout.py consults
// (is_whitespace = rune.isspace() on the cluster's first source rune)
inline bool is_space_cp(uint32_t cp) {
  return (cp >= 0x09 && cp <= 0x0D) || (cp >= 0x1C && cp <= 0x1F) ||
         cp == 0x20 || cp == 0x85 || cp == 0xA0 || cp == 0x1680 ||
         (cp >= 0x2000 && cp <= 0x200A) || cp == 0x2028 || cp == 0x2029 ||
         cp == 0x202F || cp == 0x205F || cp == 0x3000;
}

// layout.py _is_cjk: CJK codepoints break lines anywhere
inline bool is_cjk_cp(uint32_t cp) {
  return (cp >= 0x1100 && cp <= 0x11FF) || (cp >= 0x2E80 && cp <= 0x9FFF) ||
         (cp >= 0xAC00 && cp <= 0xD7AF) || (cp >= 0xF900 && cp <= 0xFAFF) ||
         (cp >= 0xFF00 && cp <= 0xFFEF) || (cp >= 0x20000 && cp <= 0x3FFFF);
}

}  // namespace

// The full single-font arrangement the box layouter produces — the data
// model behind BOTH fd_typeset_box (draw stream) and the fd_arr_* geometry
// suite (glyph/cluster rects, selection bands, carets — the reference
// exports the same GlyphArrangement surface over its ABI,
// common/fonttypes.nim:430-808 {.nativeAbi.}). Glyph storage is LOGICAL
// order; positions carry the bidi visual order.
struct FdArrangement {
  std::vector<uint32_t> g;       // glyph ids
  std::vector<uint32_t> cl, cle;  // source rune [start, end)
  std::vector<double> adv;       // px (attached marks carry 0)
  std::vector<float> draw_x, draw_y;  // pen + fold-in offsets (draw stream)
  std::vector<double> pen_x;     // pen x BEFORE offsets (rect x)
  std::vector<double> rect_y;    // line top (rect y)
  std::vector<uint8_t> is_ws, is_nl;
  std::vector<int32_t> line_idx;
  std::vector<int32_t> lvl;      // resolved bidi level at cluster start
  std::vector<std::pair<size_t, size_t>> lines;  // inclusive glyph ranges
  double line_h = 0.0;
  double max_line_w = 0.0, total_h = 0.0;
  int32_t n_src = 0;  // source rune count (caret indices run 0..n_src)
};

namespace {

// layout.py typeset's line-break + position pipeline (single font) — the
// shared core of fd_typeset_box and fd_typeset_box_make
// cap_limit >= 0 bounds the glyph count (checked as soon as shaping +
// line breaking know it, BEFORE the positioning pass — an E_CAP retry
// must not pay alignment/bidi-visual-order work it will throw away);
// geom=false skips the query-only geometry arrays (pen_x, rect_y,
// line_idx, lvl) the draw-stream entry point never reads.
int32_t box_layout_core(const FdFontPack *pack, const uint32_t *cps,
                        int32_t n, float size_px, float line_height,
                        float bounds_w, float bounds_h, int32_t h_align,
                        int32_t v_align, int32_t wrap, FdArrangement &a,
                        int32_t cap_limit = -1, bool geom = true) {
  if (n < 0) return FD_TYPESET_E_CAP;
  double scale = pack->upem > 0 ? (double)size_px / pack->upem : 0.0;
  a.n_src = n;

  // UAX#9 over the full logical text (layout.py:528-544): levels + bases;
  // pure-LTR text (no odd level) skips every bidi branch below. ASCII has
  // no RTL/AL characters, so every level resolves to 0 in an LTR
  // paragraph — skip the whole pass like layout.py's isascii() hot path.
  bool all_ascii = true;
  for (int32_t k = 0; k < n; k++)
    if (cps[k] >= 0x80) {
      all_ascii = false;
      break;
    }
  std::vector<int32_t> levels, bases;
  bool any_rtl = false;
  if (all_ascii) {
    levels.assign((size_t)n, 0);
    bases.assign((size_t)n, 0);
  } else {
    bidi::compute_levels(pack, cps, (size_t)n, levels, bases);
    for (int32_t l : levels)
      if (l % 2) any_rtl = true;
  }
  // L4: RTL-context chars shape via their mirrored counterpart
  // (layout.py:573-575 — the mirror happens BEFORE the cmap lookup)
  std::vector<uint32_t> mcps;
  const uint32_t *scps = cps;
  if (any_rtl) {
    mcps.assign(cps, cps + n);
    for (int32_t k = 0; k < n; k++)
      if (levels[k] % 2) mcps[k] = bidi::mirror_cp(pack, cps[k]);
    scps = mcps.data();
  }

  // shape per newline-delimited segment (ligatures never cross '\n' —
  // layout.py's segment loop), emitting the '\n' itself as a zero-advance
  // gid-0 glyph exactly like the Python records path
  std::vector<double> offx, offy;  // px, y-DOWN (mark/cursive offsets)
  std::vector<uint8_t> cjk;
  {
    int32_t i = 0;
    while (i <= n) {
      int32_t j = i;
      while (j < n && cps[j] != '\n') j++;
      int32_t seg_n = j - i;
      if (seg_n > 0) {
        ShapeOut so;
        int32_t count = shape_core(pack, scps + i, seg_n, so);
        if (count < 0) return count;
        PosOut po;
        position_core(pack, so, false, po,
                      any_rtl ? levels.data() + i : nullptr);
        for (int32_t k = 0; k < count; k++) {
          uint32_t rune = cps[i + so.cl[k]];
          a.g.push_back(so.g[k]);
          a.cl.push_back((uint32_t)i + so.cl[k]);
          a.cle.push_back((uint32_t)i + so.cle[k]);
          a.adv.push_back(po.adv[k] * scale);
          offx.push_back(po.dx[k] * scale);
          offy.push_back(-po.dy[k] * scale);  // font y-up → screen y-down
          a.is_ws.push_back(is_space_cp(rune) && !po.attached[k] ? 1 : 0);
          a.is_nl.push_back(0);
          cjk.push_back(is_cjk_cp(rune) ? 1 : 0);
        }
      }
      if (j < n) {  // the newline glyph (layout.py:629-636)
        a.g.push_back(0);
        a.cl.push_back((uint32_t)j);
        a.cle.push_back((uint32_t)j + 1);
        a.adv.push_back(0.0);
        offx.push_back(0.0);
        offy.push_back(0.0);
        a.is_ws.push_back(1);
        a.is_nl.push_back(1);
        cjk.push_back(0);
      }
      i = j + 1;
      if (j >= n) break;
    }
  }

  // line breaking (layout.py:747-788: greedy with reflow from the new start)
  size_t line_start = 0;
  double x = 0.0;
  long last_break = -1;
  size_t i = 0;
  while (i < a.g.size()) {
    if (a.is_nl[i]) {
      a.lines.emplace_back(line_start, i);  // the '\n' rides its line
      line_start = i + 1;
      x = 0.0;
      last_break = -1;
      i++;
      continue;
    }
    bool breakable = a.is_ws[i] || cjk[i];
    if (wrap && bounds_w > 0 && x + a.adv[i] > bounds_w && i > line_start &&
        !a.is_ws[i]) {
      if (last_break >= (long)line_start) {
        a.lines.emplace_back(line_start, (size_t)last_break);
        line_start = (size_t)last_break + 1;
      } else {
        a.lines.emplace_back(line_start, i - 1);
        line_start = i;
      }
      x = 0.0;
      last_break = -1;
      i = line_start;  // reflow
      continue;
    }
    x += a.adv[i];
    if (breakable) last_break = (long)i;
    i++;
  }
  if (line_start < a.g.size())
    a.lines.emplace_back(line_start, a.g.size() - 1);

  if (cap_limit >= 0 && (int32_t)a.g.size() > cap_limit)
    return FD_TYPESET_E_CAP;

  // positioning (layout.py:792-845; single-font arrangement)
  double ascent = pack->ascent * scale;
  double descent = -pack->descent * scale;
  double line_gap = pack->line_gap * scale;
  a.line_h =
      line_height > 0 ? (double)line_height : ascent + descent + line_gap;
  double baseline_off = std::nearbyint(ascent + line_gap * 0.5);
  size_t ng = a.g.size();
  a.draw_x.resize(ng);
  a.draw_y.resize(ng);
  if (geom) {
    a.pen_x.resize(ng);
    a.rect_y.resize(ng);
    a.line_idx.assign(ng, 0);
    a.lvl.resize(ng);
    for (size_t k = 0; k < ng; k++)
      a.lvl[k] = a.cl[k] < levels.size() ? levels[a.cl[k]] : 0;
  }
  double y = 0.0;
  double max_line_w = 0.0;
  for (size_t li = 0; li < a.lines.size(); li++) {
    auto [s_i, e_i] = a.lines[li];
    double baseline = y + baseline_off;
    double line_w = 0.0, visible_w = 0.0;
    for (size_t k = s_i; k <= e_i; k++) {
      line_w += a.adv[k];
      if (!a.is_ws[k]) visible_w = line_w;
    }
    double pen = 0.0;
    if (h_align == 1)
      pen = bounds_w > 0 ? (bounds_w - visible_w) / 2.0 : 0.0;
    else if (h_align == 2)
      pen = bounds_w > 0 ? bounds_w - visible_w : 0.0;
    // visual order (bidi L1+L2, layout.py:824-838): glyph storage stays
    // logical (gids/clusters arrays), only the pen x order flips
    std::vector<size_t> order;
    if (any_rtl) {
      size_t ln = e_i - s_i + 1;
      std::vector<int32_t> line_lv(ln), line_ty(ln);
      for (size_t k = 0; k < ln; k++) {
        uint32_t cs = a.cl[s_i + k];
        line_lv[k] = levels[cs];
        line_ty[k] = bidi::char_type(pack, cps[cs]);
      }
      order = bidi::line_visual_order(line_lv, line_ty, bases[a.cl[s_i]]);
    } else {
      order.resize(e_i - s_i + 1);
      for (size_t k = 0; k < order.size(); k++) order[k] = k;
    }
    for (size_t q : order) {
      size_t k = s_i + q;
      // per-glyph offsets fold into the emitted positions: a host draws
      // glyph k at (draw_x[k], draw_y[k]) and attached marks land on their
      // base's anchor (layout.py's pos + offset, consumed by glyphs.py)
      a.draw_x[k] = (float)(pen + offx[k]);
      a.draw_y[k] = (float)(baseline + offy[k]);
      if (geom) {
        a.pen_x[k] = pen;  // rect x (layout.py g.rect — pre-offset pen)
        a.rect_y[k] = y;
        a.line_idx[k] = (int32_t)li;
      }
      pen += a.adv[k];
    }
    if (visible_w > max_line_w) max_line_w = visible_w;
    y += a.line_h;
  }
  a.max_line_w = max_line_w;
  a.total_h = y;
  if (v_align != 0 && bounds_h > 0) {
    double dy = bounds_h - a.total_h;
    if (v_align == 1) dy /= 2.0;
    if (dy != 0)
      for (size_t k = 0; k < ng; k++) {
        a.draw_y[k] = (float)(a.draw_y[k] + dy);
        if (geom) a.rect_y[k] += dy;  // layout.py shifts g.rect too
      }
  }
  return (int32_t)ng;
}

}  // namespace

int32_t fd_typeset_box(const FdFontPack *pack, const uint32_t *cps, int32_t n,
                       float size_px, float line_height, float bounds_w,
                       float bounds_h, int32_t h_align, int32_t v_align,
                       int32_t wrap, uint32_t *gids, float *xs, float *ys,
                       uint32_t *clusters, int32_t cap, float *out_size) {
  FdArrangement a;
  int32_t count = box_layout_core(pack, cps, n, size_px, line_height,
                                  bounds_w, bounds_h, h_align, v_align, wrap,
                                  a, cap, /*geom=*/false);
  if (count < 0) return count;
  if (count > cap) return FD_TYPESET_E_CAP;  // unreachable; belt-and-braces
  for (int32_t k = 0; k < count; k++) {
    if (gids) gids[k] = a.g[k];
    if (xs) xs[k] = a.draw_x[k];
    if (ys) ys[k] = a.draw_y[k];
    if (clusters) clusters[k] = a.cl[k];
  }
  if (out_size) {
    out_size[0] = (float)a.max_line_w;
    out_size[1] = (float)a.total_h;
  }
  return count;
}

// ==== arrangement geometry over the C ABI ====================================
// The reference exports the GlyphArrangement query suite to C hosts
// (fonttypes.nim:430-808 {.nativeAbi.}: glyphRect, clusterRect,
// selectionRectsFor, caret positions, glyphIndexAt, ...). These are the
// same functions layout.py implements — C twins, pinned position-for-
// position by tests/test_native_typeset.py.

namespace {

void line_for_glyph(const FdArrangement *a, size_t i, size_t *s, size_t *e) {
  for (auto [ls, le] : a->lines)
    if (ls <= i && i <= le) {
      *s = ls;
      *e = le;
      return;
    }
  *s = 0;
  *e = a->g.empty() ? 0 : a->g.size() - 1;
}

struct ArrRect {
  double x, y, w, h;
};

ArrRect glyph_rect_of(const FdArrangement *a, size_t i) {
  return {a->pen_x[i], a->rect_y[i], a->adv[i], a->line_h};
}

// glyphAppearsRtl (fonttypes.nim:430-442 / layout.py _glyph_appears_rtl):
// line neighbors' source order, falling back to the resolved bidi level
bool appears_rtl(const FdArrangement *a, size_t i) {
  size_t ls, le;
  line_for_glyph(a, i, &ls, &le);
  uint32_t cs = a->cl[i];
  if (i > ls && a->cl[i - 1] > cs) return true;
  if (i < le && a->cl[i + 1] < cs) return true;
  if (ls == le) return a->lvl[i] % 2 == 1;
  return false;
}

// clusterGlyphRangeForGlyph: adjacent same-line glyphs sharing the exact
// source range
void cluster_glyph_range(const FdArrangement *a, size_t i, size_t *ca,
                         size_t *cb) {
  size_t ls, le;
  line_for_glyph(a, i, &ls, &le);
  uint32_t s0 = a->cl[i], e0 = a->cle[i];
  size_t lo = i, hi = i;
  while (lo > ls && a->cl[lo - 1] == s0 && a->cle[lo - 1] == e0) lo--;
  while (hi < le && a->cl[hi + 1] == s0 && a->cle[hi + 1] == e0) hi++;
  *ca = lo;
  *cb = hi;
}

ArrRect cluster_rect_of(const FdArrangement *a, size_t i) {
  size_t ca, cb;
  cluster_glyph_range(a, i, &ca, &cb);
  double min_x = 1e300, min_y = 1e300, max_x = -1e300, max_y = -1e300;
  for (size_t k = ca; k <= cb; k++) {
    ArrRect r = glyph_rect_of(a, k);
    min_x = std::min(min_x, std::min(r.x, r.x + r.w));
    max_x = std::max(max_x, std::max(r.x, r.x + r.w));
    min_y = std::min(min_y, r.y);
    max_y = std::max(max_y, r.y + r.h);
  }
  return {min_x, min_y, max_x - min_x, max_y - min_y};
}

// selectedGlyphRectForRange: cluster rect clipped to the selected fraction
// of the glyph's source range (partial ligature selections; from the right
// edge for RTL glyphs)
ArrRect selected_glyph_rect(const FdArrangement *a, size_t i,
                            int32_t sel_start, int32_t sel_end) {
  int32_t rs = (int32_t)a->cl[i], re = (int32_t)a->cle[i];
  int32_t cs = std::max(sel_start, rs), ce = std::min(sel_end, re);
  if (ce <= cs || re <= rs) return {0, 0, 0, 0};
  ArrRect r = cluster_rect_of(a, i);
  double min_x = std::min(r.x, r.x + r.w);
  double max_x = std::max(r.x, r.x + r.w);
  double width = max_x - min_x;
  double nn = std::max(re - rs, 1);
  double t0 = std::max(0.0, std::min((double)(cs - rs) / nn, 1.0));
  double t1 = std::max(0.0, std::min((double)(ce - rs) / nn, 1.0));
  double x0, x1;
  if (appears_rtl(a, i)) {
    x0 = max_x - width * t0;
    x1 = max_x - width * t1;
  } else {
    x0 = min_x + width * t0;
    x1 = min_x + width * t1;
  }
  return {std::min(x0, x1), r.y, std::fabs(x1 - x0), r.h};
}

}  // namespace

FdArrangement *fd_typeset_box_make(const FdFontPack *pack,
                                   const uint32_t *cps, int32_t n,
                                   float size_px, float line_height,
                                   float bounds_w, float bounds_h,
                                   int32_t h_align, int32_t v_align,
                                   int32_t wrap) {
  FdArrangement *a = new FdArrangement();
  int32_t count = box_layout_core(pack, cps, n, size_px, line_height,
                                  bounds_w, bounds_h, h_align, v_align, wrap,
                                  *a);
  if (count < 0) {
    delete a;
    return nullptr;
  }
  return a;
}

void fd_arr_free(FdArrangement *a) { delete a; }

int32_t fd_arr_glyph_count(const FdArrangement *a) {
  return (int32_t)a->g.size();
}

int32_t fd_arr_glyphs(const FdArrangement *a, uint32_t *gids, float *xs,
                      float *ys, uint32_t *clusters, int32_t cap) {
  int32_t count = (int32_t)a->g.size();
  if (count > cap) return FD_TYPESET_E_CAP;
  for (int32_t k = 0; k < count; k++) {
    if (gids) gids[k] = a->g[k];
    if (xs) xs[k] = a->draw_x[k];
    if (ys) ys[k] = a->draw_y[k];
    if (clusters) clusters[k] = a->cl[k];
  }
  return count;
}

void fd_arr_content_size(const FdArrangement *a, float *out_size) {
  out_size[0] = (float)a->max_line_w;
  out_size[1] = (float)a->total_h;
}

int32_t fd_arr_line_count(const FdArrangement *a) {
  return (int32_t)a->lines.size();
}

int32_t fd_arr_line_range(const FdArrangement *a, int32_t line,
                          int32_t *out) {
  if (line < 0 || (size_t)line >= a->lines.size()) return -1;
  out[0] = (int32_t)a->lines[(size_t)line].first;
  out[1] = (int32_t)a->lines[(size_t)line].second;
  return 0;
}

void fd_arr_glyph_rect(const FdArrangement *a, int32_t i, float *out) {
  if (i < 0 || (size_t)i >= a->g.size()) {
    out[0] = out[1] = out[2] = out[3] = 0;
    return;
  }
  ArrRect r = glyph_rect_of(a, (size_t)i);
  out[0] = (float)r.x;
  out[1] = (float)r.y;
  out[2] = (float)r.w;
  out[3] = (float)r.h;
}

void fd_arr_cluster_rect(const FdArrangement *a, int32_t i, float *out) {
  if (i < 0 || (size_t)i >= a->g.size()) {
    out[0] = out[1] = out[2] = out[3] = 0;
    return;
  }
  ArrRect r = cluster_rect_of(a, (size_t)i);
  out[0] = (float)r.x;
  out[1] = (float)r.y;
  out[2] = (float)r.w;
  out[3] = (float)r.h;
}

int32_t fd_arr_source_range(const FdArrangement *a, int32_t i,
                            uint32_t *out) {
  if (i < 0 || (size_t)i >= a->g.size()) return -1;
  out[0] = a->cl[(size_t)i];
  out[1] = a->cle[(size_t)i];
  return 0;
}

int32_t fd_arr_glyph_range_for(const FdArrangement *a, int32_t ra,
                               int32_t rb, int32_t *out) {
  long lo = -1, hi = -1;
  for (size_t i = 0; i < a->g.size(); i++) {
    if ((int32_t)a->cle[i] > ra && (int32_t)a->cl[i] <= rb) {
      if (lo < 0) lo = (long)i;
      hi = (long)i;
    }
  }
  if (lo < 0) {
    out[0] = 0;
    out[1] = -1;
    return -1;
  }
  out[0] = (int32_t)lo;
  out[1] = (int32_t)hi;
  return 0;
}

int32_t fd_arr_selection_rects(const FdArrangement *a, int32_t ra,
                               int32_t rb, float *rects, int32_t cap) {
  if (ra > rb) return 0;
  int32_t sel_start = std::max(ra, 0);
  // clamp before the +1: rb = INT32_MAX is the natural "select everything"
  // idiom and must not overflow to INT32_MIN (every cl/cle is <= n_src, so
  // the clamp is semantics-preserving vs layout.py's unbounded ints)
  int32_t sel_end = std::min(rb, a->n_src) + 1;
  if (sel_end <= sel_start) return 0;
  int32_t count = 0;
  auto emit = [&](double x0, double x1, double ly, double lh) {
    if (count < cap && rects) {
      rects[count * 4 + 0] = (float)x0;
      rects[count * 4 + 1] = (float)ly;
      rects[count * 4 + 2] = (float)(x1 - x0);
      rects[count * 4 + 3] = (float)lh;
    }
    count++;
  };
  for (auto [s, e] : a->lines) {
    if (e < s || a->g.empty()) continue;
    // selectionLineBox: vertical extent = union of the line's glyph rects
    double ly = 1e300, ly2 = -1e300;
    for (size_t k = s; k <= e; k++) {
      ly = std::min(ly, a->rect_y[k]);
      ly2 = std::max(ly2, a->rect_y[k] + a->line_h);
    }
    double lh = std::max(ly2 - ly, 0.0);
    // walk by VISUAL x so "an unselected glyph in between" means visually
    // in between (the reference stores glyphs in visual order)
    std::vector<size_t> visual;
    for (size_t k = s; k <= e; k++) visual.push_back(k);
    std::stable_sort(visual.begin(), visual.end(), [&](size_t p, size_t q) {
      ArrRect rp = glyph_rect_of(a, p), rq = glyph_rect_of(a, q);
      return std::min(rp.x, rp.x + rp.w) < std::min(rq.x, rq.x + rq.w);
    });
    bool have_band = false;
    double b0 = 0, b1 = 0;
    for (size_t k : visual) {
      if ((int32_t)a->cle[k] > sel_start && (int32_t)a->cl[k] < sel_end) {
        ArrRect r = selected_glyph_rect(a, k, sel_start, sel_end);
        double gx0 = std::min(r.x, r.x + r.w);
        double gx1 = std::max(r.x, r.x + r.w);
        if (!have_band) {
          b0 = gx0;
          b1 = gx1;
          have_band = true;
        } else {
          b0 = std::min(b0, gx0);
          b1 = std::max(b1, gx1);
        }
      } else if (have_band) {
        emit(b0, b1, ly, lh);
        have_band = false;
      }
    }
    if (have_band) emit(b0, b1, ly, lh);
  }
  return count;  // caller grows on count > cap
}

int32_t fd_arr_caret_positions(const FdArrangement *a, int32_t source_rune,
                               float *out, int32_t cap) {
  // Dedup runs against a local stash, NOT the caller buffer: the count a
  // cap=0 count query returns must equal what a full-size second call
  // writes (bidi-doubled carets dedup the same either way), and a NULL
  // `out` with a nonzero cap must never be read through.
  std::vector<std::array<float, 6>> stash;
  auto add = [&](double x, double y, double h, int32_t line, int32_t gi,
                 int32_t aff) {
    for (const auto &q : stash)
      if ((int32_t)q[3] == line && std::fabs(q[0] - x) < 1e-3 &&
          std::fabs(q[1] - y) < 1e-3)
        return;
    stash.push_back({(float)x, (float)y, (float)h, (float)line, (float)gi,
                     (float)aff});
  };
  auto finish = [&]() {
    int32_t count = (int32_t)stash.size();
    if (out)
      for (int32_t q = 0; q < std::min(count, cap); q++)
        std::memcpy(out + (size_t)q * 6, stash[(size_t)q].data(),
                    6 * sizeof(float));
    return count;
  };
  if (a->g.empty()) {
    if (source_rune == 0) add(0, 0, 0, 0, -1, 0);
    return finish();
  }
  auto caret_x = [](const ArrRect &r, bool rtl, bool source_start) {
    if (source_start) return rtl ? r.x + r.w : r.x;
    return rtl ? r.x : r.x + r.w;
  };
  for (size_t i = 0; i < a->g.size(); i++) {
    int32_t rs = (int32_t)a->cl[i], re = (int32_t)a->cle[i];
    ArrRect r = cluster_rect_of(a, i);
    bool rtl = appears_rtl(a, i);
    int32_t line = a->line_idx[i];
    if (rs == source_rune)
      add(caret_x(r, rtl, true), r.y, r.h, line, (int32_t)i, 0);
    if (re == source_rune)
      add(caret_x(r, rtl, false), r.y, r.h, line, (int32_t)i, 1);
    if (rs < source_rune && source_rune < re) {
      double t = (double)(source_rune - rs) / std::max(re - rs, 1);
      double x = r.x + r.w * (rtl ? 1.0 - t : t);
      add(x, r.y, r.h, line, (int32_t)i, 2);
    }
  }
  return finish();
}

int32_t fd_arr_glyph_index_at(const FdArrangement *a, float x, float y) {
  for (size_t i = 0; i < a->g.size(); i++) {
    ArrRect r = glyph_rect_of(a, i);
    if (r.x <= x && x < r.x + r.w && r.y <= y && y < r.y + r.h)
      return (int32_t)i;
  }
  return -1;
}

int32_t fd_arr_nearest_source_rune(const FdArrangement *a, float x,
                                   float y) {
  int32_t best = 0;
  double best_d = 1e300;
  std::vector<float> buf(64 * 6);
  for (int32_t sr = 0; sr <= a->n_src; sr++) {
    int32_t nc = fd_arr_caret_positions(a, sr, buf.data(),
                                        (int32_t)(buf.size() / 6));
    if (nc > (int32_t)(buf.size() / 6)) {
      buf.resize((size_t)nc * 6);
      nc = fd_arr_caret_positions(a, sr, buf.data(), nc);
    }
    for (int32_t q = 0; q < nc; q++) {
      double cx = buf[q * 6 + 0], cy = buf[q * 6 + 1], ch = buf[q * 6 + 2];
      double dx = (double)x - cx;
      double dy = 0.0;
      if (y < cy)
        dy = cy - y;
      else if (y > cy + ch)
        dy = y - (cy + ch);
      double d = dx * dx + dy * dy;
      if (d < best_d) {
        best_d = d;
        best = sr;
      }
    }
  }
  return best;
}

int32_t fd_utf8_to_cps(const char *utf8, int32_t len, uint32_t *cps,
                       int32_t cap) {
  if (utf8 == nullptr) return 0;
  size_t n = len < 0 ? std::strlen(utf8) : (size_t)len;
  const uint8_t *s = (const uint8_t *)utf8;
  int32_t out = 0;
  size_t i = 0;
  while (i < n) {
    uint32_t cp = 0xFFFD;
    uint8_t b = s[i];
    size_t more = 0;
    if (b < 0x80) {
      cp = b;
    } else if ((b & 0xE0) == 0xC0) {
      cp = b & 0x1F;
      more = 1;
    } else if ((b & 0xF0) == 0xE0) {
      cp = b & 0x0F;
      more = 2;
    } else if ((b & 0xF8) == 0xF0) {
      cp = b & 0x07;
      more = 3;
    }
    if (more) {
      if (i + more >= n) {  // truncated sequence
        cp = 0xFFFD;
        more = 0;
      } else {
        bool complete = true;
        for (size_t k = 1; k <= more; k++) {
          if ((s[i + k] & 0xC0) != 0x80) {
            cp = 0xFFFD;
            more = k - 1;
            complete = false;
            break;
          }
          cp = (cp << 6) | (s[i + k] & 0x3F);
        }
        if (complete) {
          // the header's contract: invalid bytes decode as U+FFFD —
          // overlong encodings, UTF-16 surrogates and out-of-range
          // codepoints are invalid per RFC 3629
          static const uint32_t kMin[4] = {0, 0x80, 0x800, 0x10000};
          if (cp < kMin[more] || cp > 0x10FFFF ||
              (cp >= 0xD800 && cp <= 0xDFFF))
            cp = 0xFFFD;
        }
      }
    }
    i += 1 + more;
    if (out >= cap) return FD_TYPESET_E_CAP;
    if (cps) cps[out] = cp;
    out++;
  }
  return out;
}

}  // extern "C"
