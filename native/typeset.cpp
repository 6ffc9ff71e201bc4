// figdraw_tpu native typesetter: FDTP v1 font-pack engine.
//
// Re-applies the compiled OpenType plan serialized by
// figdraw_tpu/text/native_pack.py with semantics IDENTICAL to the Python
// shaper (figdraw_tpu/text/shaper.py — the clean-room counterpart of the
// reference's HarfBuzz binding, /root/reference/src/figdraw/textbackends/
// harfbuzzy.nim): lookup records apply in plan order; at each position a
// lookup's subtable entries are tried in order and the first match wins;
// LookupFlag skipping (GDEF classes, MarkFilteringSet, MarkAttachmentType)
// filters multi-glyph matching. tests/test_native_typeset.py pins this
// engine glyph-for-glyph against the Python pipeline.
//
// Scope: the simple-script pipeline only. Text whose shaped run contains an
// attach-capable mark (GPOS 4/5/6 coverage, MARK_BIT in the pack's GDEF
// bytes) is refused with FD_TYPESET_E_MARKS — the ABI boundary documented
// in docs/native_api.md.

#include "figdraw_typeset.h"

#include <cmath>
#include <cstring>
#include <string>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x46445450;  // 'FDTP'
constexpr uint32_t kVersion = 1;
constexpr uint8_t kMarkBit = 0x80;  // gdef byte: attach-capable mark
constexpr uint8_t kClassMask = 0x7F;

// entry kinds (native_pack.py)
constexpr uint32_t K_SINGLE = 1;
constexpr uint32_t K_MULTIPLE = 2;
constexpr uint32_t K_LIGA = 4;
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

struct Entry {
  uint32_t kind = 0;
  std::vector<SingleRow> single;  // sorted by from
  std::unordered_map<uint16_t, std::vector<uint16_t>> multiple;
  std::unordered_map<uint16_t, std::vector<LigaCand>> liga;  // emit order kept
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

}  // namespace

struct FdFontPack {
  float upem = 0, ascent = 0, descent = 0, line_gap = 0;
  uint32_t flags = 0;
  uint32_t n_glyphs = 0;
  std::vector<std::pair<uint32_t, uint32_t>> cmap;  // sorted by codepoint
  std::vector<float> advances;
  std::vector<uint8_t> gdef;     // low 7 bits class, bit 7 mark
  std::vector<uint8_t> mattach;  // MarkAttachClassDef class
  std::vector<Lookup> gsub, gpos;
  std::vector<KernRow> kern0;  // sorted by (left, right)
};

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

// ---- GSUB (shaper._try_entry_at / _apply_plan) -------------------------------

// Returns the next cursor position on match, or -1.
long try_sub_entry(const FdFontPack *pk, const Lookup &L, const Entry &e,
                   std::vector<uint16_t> &g, std::vector<uint32_t> &cl,
                   size_t i) {
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
        return (long)i;
      }
      uint32_t c = cl[i];  // decomposed glyphs inherit the source cluster
      g.erase(g.begin() + i);
      g.insert(g.begin() + i, seq.begin(), seq.end());
      cl.erase(cl.begin() + i);
      cl.insert(cl.begin() + i, seq.size(), c);
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
          if (j >= g.size() || g[j] != comp) {
            okm = false;
            break;
          }
          pos.push_back(j);
          j++;
        }
        if (!okm) continue;
        // the ligature replaces the first component; later matched
        // components are removed, skipped glyphs in between stay put
        g[i] = cand.result;
        for (size_t k = pos.size(); k-- > 1;) {
          g.erase(g.begin() + pos[k]);
          cl.erase(cl.begin() + pos[k]);
        }
        return (long)i + 1;
      }
      return -1;
    }
    default:
      return -1;
  }
}

// ---- GPOS kern (shaper._try_pos_entry_at / position) -------------------------

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
    pk->gsub.resize(n_sub);
    for (uint32_t k = 0; k < n_sub && ok; k++)
      ok = parse_lookup(r, base, pk->gsub[k]);
    pk->gpos.resize(n_pos);
    for (uint32_t k = 0; k < n_pos && ok; k++)
      ok = parse_lookup(r, base, pk->gpos[k]);
    pk->kern0.resize(n_kern0);
    for (uint32_t k = 0; k < n_kern0; k++) {
      pk->kern0[k].left = r.u16();
      pk->kern0[k].right = r.u16();
      pk->kern0[k].value = r.i16();
      r.u16();  // pad
    }
  }
  if (!ok || !r.ok) {
    delete pk;
    return nullptr;
  }
  return pk;
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

int32_t fd_typeset_shape(const FdFontPack *pack, const uint32_t *cps,
                         int32_t n, uint32_t *gids, float *advances,
                         uint32_t *clusters, int32_t cap) {
  if (n < 0) return FD_TYPESET_E_CAP;
  std::vector<uint16_t> g((size_t)n);
  std::vector<uint32_t> cl((size_t)n);
  for (int32_t k = 0; k < n; k++) {
    g[k] = (uint16_t)fd_pack_glyph_id(pack, cps[k]);
    cl[k] = (uint32_t)k;
  }

  // GSUB plan: lookups in order; entries first-match-wins per position
  // (shaper._apply_plan)
  for (const Lookup &L : pack->gsub) {
    size_t i = 0;
    while (i < g.size()) {
      if (skipped(pack, L, g[i])) {
        i++;
        continue;
      }
      long nxt = -1;
      for (const Entry &e : L.entries) {
        nxt = try_sub_entry(pack, L, e, g, cl, i);
        if (nxt >= 0) break;
      }
      i = nxt >= 0 ? (size_t)nxt : i + 1;
    }
  }

  // mark refusal: GPOS mark attachment is not exported — a shaped run
  // containing an attach-capable mark cannot be positioned natively
  if (pack->flags & FD_PACK_HAS_MARKS) {
    for (uint16_t gg : g)
      if (gg < pack->gdef.size() && (pack->gdef[gg] & kMarkBit))
        return FD_TYPESET_E_MARKS;
  }

  // kerning: GPOS kern feature (shaper.position), else legacy kern table
  std::vector<int32_t> deltas(g.size(), 0);
  if (pack->flags & FD_PACK_HAS_GPOS_KERN) {
    for (const Lookup &L : pack->gpos) {
      if (L.entries.empty()) continue;
      size_t i = 0;
      while (i < g.size()) {
        if (skipped(pack, L, g[i])) {
          i++;
          continue;
        }
        long nxt = -1;
        for (const Entry &e : L.entries) {
          nxt = try_pos_entry(pack, L, e, g, deltas, i);
          if (nxt >= 0) break;
        }
        i = (nxt >= 0 && (size_t)nxt > i) ? (size_t)nxt : i + 1;
      }
    }
  }

  int32_t count = (int32_t)g.size();
  if (count > cap) return FD_TYPESET_E_CAP;
  for (int32_t k = 0; k < count; k++) {
    if (gids) gids[k] = g[k];
    if (clusters) clusters[k] = cl[k];
    if (advances) {
      float adv = fd_pack_advance(pack, g[k]) + (float)deltas[k];
      advances[k] = adv;
    }
  }
  if (advances && !(pack->flags & FD_PACK_HAS_GPOS_KERN) &&
      !pack->kern0.empty()) {
    // the legacy 'kern' value lands on the LEFT glyph's advance
    // (layout.py:717-725 folds it into the previous pen glyph)
    for (int32_t k = 0; k + 1 < count; k++)
      advances[k] += kern0_lookup(pack, g[k], g[k + 1]);
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

int32_t fd_typeset_box(const FdFontPack *pack, const uint32_t *cps, int32_t n,
                       float size_px, float line_height, float bounds_w,
                       float bounds_h, int32_t h_align, int32_t v_align,
                       int32_t wrap, uint32_t *gids, float *xs, float *ys,
                       uint32_t *clusters, int32_t cap, float *out_size) {
  if (n < 0) return FD_TYPESET_E_CAP;
  double scale = pack->upem > 0 ? (double)size_px / pack->upem : 0.0;

  // shape per newline-delimited segment (ligatures never cross '\n' —
  // layout.py's segment loop), emitting the '\n' itself as a zero-advance
  // gid-0 glyph exactly like the Python records path
  std::vector<uint32_t> g;
  std::vector<uint32_t> cl;
  std::vector<double> adv;       // px
  std::vector<uint8_t> is_ws;    // rune.isspace() of the cluster rune
  std::vector<uint8_t> is_nl;    // rune == '\n'
  std::vector<uint8_t> cjk;
  {
    std::vector<uint32_t> seg_gids(64);
    std::vector<float> seg_adv(64);
    std::vector<uint32_t> seg_cl(64);
    int32_t i = 0;
    while (i <= n) {
      int32_t j = i;
      while (j < n && cps[j] != '\n') j++;
      int32_t seg_n = j - i;
      if (seg_n > 0) {
        int32_t count = fd_typeset_shape(pack, cps + i, seg_n,
                                         seg_gids.data(), seg_adv.data(),
                                         seg_cl.data(),
                                         (int32_t)seg_gids.size());
        while (count == FD_TYPESET_E_CAP &&
               seg_gids.size() < (1u << 24)) {
          seg_gids.resize(seg_gids.size() * 2);
          seg_adv.resize(seg_adv.size() * 2);
          seg_cl.resize(seg_cl.size() * 2);
          count = fd_typeset_shape(pack, cps + i, seg_n, seg_gids.data(),
                                   seg_adv.data(), seg_cl.data(),
                                   (int32_t)seg_gids.size());
        }
        if (count < 0) return count;
        for (int32_t k = 0; k < count; k++) {
          uint32_t rune = cps[i + seg_cl[k]];
          g.push_back(seg_gids[k]);
          cl.push_back((uint32_t)i + seg_cl[k]);
          adv.push_back(seg_adv[k] * scale);
          is_ws.push_back(is_space_cp(rune) ? 1 : 0);
          is_nl.push_back(0);
          cjk.push_back(is_cjk_cp(rune) ? 1 : 0);
        }
      }
      if (j < n) {  // the newline glyph (layout.py:629-636)
        g.push_back(0);
        cl.push_back((uint32_t)j);
        adv.push_back(0.0);
        is_ws.push_back(1);
        is_nl.push_back(1);
        cjk.push_back(0);
      }
      i = j + 1;
      if (j >= n) break;
    }
  }

  // line breaking (layout.py:747-788: greedy with reflow from the new start)
  std::vector<std::pair<size_t, size_t>> lines;
  size_t line_start = 0;
  double x = 0.0;
  long last_break = -1;
  size_t i = 0;
  while (i < g.size()) {
    if (is_nl[i]) {
      lines.emplace_back(line_start, i);  // the '\n' rides its line
      line_start = i + 1;
      x = 0.0;
      last_break = -1;
      i++;
      continue;
    }
    bool breakable = is_ws[i] || cjk[i];
    if (wrap && bounds_w > 0 && x + adv[i] > bounds_w && i > line_start &&
        !is_ws[i]) {
      if (last_break >= (long)line_start) {
        lines.emplace_back(line_start, (size_t)last_break);
        line_start = (size_t)last_break + 1;
      } else {
        lines.emplace_back(line_start, i - 1);
        line_start = i;
      }
      x = 0.0;
      last_break = -1;
      i = line_start;  // reflow
      continue;
    }
    x += adv[i];
    if (breakable) last_break = (long)i;
    i++;
  }
  if (line_start < g.size()) lines.emplace_back(line_start, g.size() - 1);

  int32_t count = (int32_t)g.size();
  if (count > cap) return FD_TYPESET_E_CAP;

  // positioning (layout.py:792-845; single-font arrangement)
  double ascent = pack->ascent * scale;
  double descent = -pack->descent * scale;
  double line_gap = pack->line_gap * scale;
  double line_h =
      line_height > 0 ? (double)line_height : ascent + descent + line_gap;
  double baseline_off = std::nearbyint(ascent + line_gap * 0.5);
  std::vector<float> px(g.size()), py(g.size());
  double y = 0.0;
  double max_line_w = 0.0;
  for (auto [s_i, e_i] : lines) {
    double baseline = y + baseline_off;
    double line_w = 0.0, visible_w = 0.0;
    for (size_t k = s_i; k <= e_i; k++) {
      line_w += adv[k];
      if (!is_ws[k]) visible_w = line_w;
    }
    double pen = 0.0;
    if (h_align == 1)
      pen = bounds_w > 0 ? (bounds_w - visible_w) / 2.0 : 0.0;
    else if (h_align == 2)
      pen = bounds_w > 0 ? bounds_w - visible_w : 0.0;
    for (size_t k = s_i; k <= e_i; k++) {
      px[k] = (float)pen;
      py[k] = (float)baseline;
      pen += adv[k];
    }
    if (visible_w > max_line_w) max_line_w = visible_w;
    y += line_h;
  }
  double total_h = y;
  if (v_align != 0 && bounds_h > 0) {
    double dy = bounds_h - total_h;
    if (v_align == 1) dy /= 2.0;
    if (dy != 0)
      for (size_t k = 0; k < g.size(); k++) py[k] = (float)(py[k] + dy);
  }

  for (int32_t k = 0; k < count; k++) {
    if (gids) gids[k] = g[k];
    if (xs) xs[k] = px[k];
    if (ys) ys[k] = py[k];
    if (clusters) clusters[k] = cl[k];
  }
  if (out_size) {
    out_size[0] = (float)max_line_w;
    out_size[1] = (float)total_h;
  }
  return count;
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
