// rawdec — native raw decoder (C ABI, loaded via ctypes).
//
// The reference delegates camera decode to rawspeed/LibRaw
// (/root/reference/src/imageio/imageio_rawspeed.cc:692 decoder set); this
// is the TPU framework's native-runtime equivalent.  Containers:
//   * DNG/TIFF — IFD walk, packed 10/12/14/16-bit mosaics, lossless
//     JPEG 1992 (T.81 process 14, SOF3) strips (compression 7),
//     ActiveArea, AsShotNeutral/ColorMatrix1.
//   * CR2 — TIFF container, raw in the last chained IFD (compression 6
//     = lossless JPEG), Canon vertical slicing via tag 0xC640.
//   * NEF — TIFF container, raw SubIFD; packed/LJ92 payloads AND the
//     vendor entropy coding (compression 34713): tree-coded Huffman
//     diffs with a two-column vertical/horizontal predictor, the
//     linearization curve + initial predictors from MakerNote tag
//     0x0096, optional tree switch at the "split" row (lossy variants).
//   * ARW — TIFF container; packed payloads AND Sony ARW2 (compression
//     32767): per-row 16-byte blocks of 16 pixels (11-bit min/max +
//     7-bit deltas with adaptive shift) through the 4-knot tone curve
//     (tag 0x7010, possibly inside the LFSR-encrypted SR2 private IFD).
//   * RAF — Fujifilm container (FUJIFILMCCD-RAW): BE offset directory,
//     CFA meta records (incl. the 6x6 X-Trans pattern, tag 0x0131),
//     uncompressed 16-bit-LE / 14-bit-packed payloads.
//
// Build: g++ -O2 -shared -fPIC rawdec.cpp -o librawdec.so

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
struct RawInfo {
  uint32_t width, height, bits, compression;
  uint32_t cfa[4];        // 2x2 pattern color indices (R=0,G=1,B=2)
  double black, white;
  double wb[3];           // AsShotNeutral (cam = wb * XYZ-ish)
  double cam_to_xyz[9];   // inverse of ColorMatrix (D65-ish)
  uint32_t n_strips;
  uint32_t iso;
  // --- container breadth (round 3) ---
  uint32_t is_xtrans;     // 1 = 6x6 X-Trans mosaic (xtrans[] valid)
  uint32_t xtrans[36];    // 6x6 color indices, row-major
  uint32_t crop[4];       // active area: top, left, bottom, right (0 = full)
  uint32_t cr2_slices[3]; // Canon tag 0xC640: count, width_a, width_last
  uint32_t container;     // 0 tiff/dng, 1 cr2, 2 raf, 3 nef, 4 arw
  uint32_t endian_le;     // payload byte order for 16-bit data
  // --- vendor entropy metadata (round 4) ---
  uint64_t nikon_meta_off;  // abs offset of MakerNote tag 0x0096 payload
  uint32_t nikon_meta_len;
  uint32_t nikon_meta_le;   // byte order of the makernote TIFF
  uint32_t sony_curve[4];   // tag 0x7010 tone-curve knots (raw u16 values)
  uint32_t has_sony_curve;
  char maker[64];
  char model[64];
  // --- round 5 ---
  uint64_t pentax_meta_off;  // abs offset of MakerNote tag 0x0220 payload
  uint32_t pentax_meta_len;
  uint32_t pentax_pad;
};
}  // extern "C"

namespace {

struct Reader {
  const uint8_t *p;
  size_t n;
  bool le;
  uint16_t u16(size_t off) const {
    if (off + 2 > n) return 0;
    return le ? (uint16_t)(p[off] | p[off + 1] << 8)
              : (uint16_t)(p[off] << 8 | p[off + 1]);
  }
  uint32_t u32(size_t off) const {
    if (off + 4 > n) return 0;
    return le ? ((uint32_t)p[off] | (uint32_t)p[off + 1] << 8 |
                 (uint32_t)p[off + 2] << 16 | (uint32_t)p[off + 3] << 24)
              : ((uint32_t)p[off] << 24 | (uint32_t)p[off + 1] << 16 |
                 (uint32_t)p[off + 2] << 8 | (uint32_t)p[off + 3]);
  }
};

struct Entry {
  uint16_t tag, type;
  uint32_t count;
  size_t value_off;  // absolute offset of the value data
};

constexpr int kTypeSize[] = {0, 1, 1, 2, 4, 8, 1, 1, 2, 4, 8, 4, 8};

struct IFD {
  std::vector<Entry> entries;
  const Entry *find(uint16_t tag) const {
    for (auto &e : entries)
      if (e.tag == tag) return &e;
    return nullptr;
  }
};

bool parse_ifd(const Reader &r, size_t off, IFD *out, size_t *next) {
  if (off + 2 > r.n) return false;
  uint16_t cnt = r.u16(off);
  if (cnt > 4096) return false;
  size_t pos = off + 2;
  for (uint16_t i = 0; i < cnt; i++, pos += 12) {
    if (pos + 12 > r.n) return false;
    Entry e;
    e.tag = r.u16(pos);
    e.type = r.u16(pos + 2);
    e.count = r.u32(pos + 4);
    int ts = (e.type < 13) ? kTypeSize[e.type] : 0;
    size_t bytes = (size_t)ts * e.count;
    e.value_off = (bytes <= 4) ? pos + 8 : r.u32(pos + 8);
    out->entries.push_back(e);
  }
  *next = r.u32(pos);
  return true;
}

uint32_t entry_uint(const Reader &r, const Entry &e, uint32_t idx = 0) {
  size_t off = e.value_off;
  switch (e.type) {
    case 1: return off + idx < r.n ? r.p[off + idx] : 0;      // BYTE
    case 3: return r.u16(off + 2 * idx);                       // SHORT
    case 4: return r.u32(off + 4 * idx);                       // LONG
    default: return 0;
  }
}

double entry_rational(const Reader &r, const Entry &e, uint32_t idx) {
  if (e.type == 5) {  // RATIONAL
    uint32_t num = r.u32(e.value_off + 8 * idx);
    uint32_t den = r.u32(e.value_off + 8 * idx + 4);
    return den ? (double)num / den : 0.0;
  }
  if (e.type == 10) {  // SRATIONAL
    int32_t num = (int32_t)r.u32(e.value_off + 8 * idx);
    int32_t den = (int32_t)r.u32(e.value_off + 8 * idx + 4);
    return den ? (double)num / den : 0.0;
  }
  if (e.type == 3) return entry_uint(r, e, idx);
  if (e.type == 4) return entry_uint(r, e, idx);
  return 0.0;
}

// ---------------------------------------------------------------------------
// Lossless JPEG 1992 (SOF3) decoder — DNG compression 7.

struct Huff {
  // canonical Huffman per T.81: maxcode/mincode/valptr tables
  int32_t mincode[17], maxcode[17];
  int valptr[17];
  uint8_t values[256];
  bool ok = false;
};

struct BitReader {
  const uint8_t *p;
  size_t n, pos = 0;
  uint32_t bits = 0;
  int nbits = 0;
  bool bad = false;
  int get(int want) {
    while (nbits < want) {
      if (pos >= n) { bad = true; return 0; }
      uint8_t b = p[pos++];
      if (b == 0xFF) {
        if (pos < n && p[pos] == 0x00) pos++;  // stuffed byte
        else { bad = true; return 0; }          // marker inside scan
      }
      bits = (bits << 8) | b;
      nbits += 8;
    }
    int v = (bits >> (nbits - want)) & ((1u << want) - 1);
    nbits -= want;
    return v;
  }
};

int huff_decode(BitReader &br, const Huff &h) {
  int code = br.get(1);
  int len = 1;
  while (len <= 16 && (h.maxcode[len] < 0 || code > h.maxcode[len])) {
    code = (code << 1) | br.get(1);
    len++;
  }
  if (len > 16 || br.bad) { br.bad = true; return 0; }
  return h.values[h.valptr[len] + code - h.mincode[len]];
}

int extend(int v, int ssss) {
  // T.81 F.2.2.1: map magnitude bits to signed difference
  if (ssss == 0) return 0;
  if (ssss == 16) return -32768;
  return (v < (1 << (ssss - 1))) ? v - (1 << ssss) + 1 : v;
}

// returns 0 on success
int lj92_decode(const uint8_t *buf, size_t len, uint16_t *out,
                size_t out_cap, int *o_w, int *o_h, int *o_comps) {
  size_t pos = 0;
  auto u16 = [&](size_t o) -> int {
    return o + 2 <= len ? (buf[o] << 8 | buf[o + 1]) : -1;
  };
  if (u16(pos) != 0xFFD8) return 1;  // SOI
  pos += 2;
  Huff tables[4];
  int w = 0, h = 0, comps = 0, precision = 0, predictor = 1, pt = 0;
  int comp_dc[4] = {0, 0, 0, 0};
  while (pos + 4 <= len) {
    int marker = u16(pos);
    int seglen = u16(pos + 2);
    if (marker < 0xFF01 || seglen < 2) return 2;
    size_t seg = pos + 4;
    if (marker == 0xFFC3) {  // SOF3
      precision = buf[seg];
      h = u16(seg + 1);
      w = u16(seg + 3);
      comps = buf[seg + 5];
      if (comps < 1 || comps > 4) return 3;
      pos += 2 + seglen;
    } else if (marker == 0xFFC4) {  // DHT
      size_t t = seg;
      while (t < seg + seglen - 2) {
        int id = buf[t] & 0x0F;
        if (id > 3) return 4;
        Huff &hh = tables[id];
        int counts[17] = {0};
        int total = 0;
        for (int i = 1; i <= 16; i++) {
          counts[i] = buf[t + i];
          total += counts[i];
        }
        if (total > 256) return 4;
        for (int i = 0; i < total; i++) hh.values[i] = buf[t + 17 + i];
        int code = 0, k = 0;
        for (int i = 1; i <= 16; i++) {
          hh.valptr[i] = k;
          hh.mincode[i] = code;
          code += counts[i];
          k += counts[i];
          hh.maxcode[i] = counts[i] ? code - 1 : -1;
          code <<= 1;
        }
        hh.ok = true;
        t += 17 + total;
      }
      pos += 2 + seglen;
    } else if (marker == 0xFFDA) {  // SOS
      int ns = buf[seg];
      int tsel[4] = {0, 0, 0, 0};
      for (int i = 0; i < ns; i++) tsel[i] = buf[seg + 2 + 2 * i] >> 4;
      // SOS tail: Ss = predictor, Se, Ah/Al (low nibble = point transform)
      predictor = buf[seg + 1 + 2 * ns];
      pt = buf[seg + 1 + 2 * ns + 2] & 0x0F;
      size_t scan = seg + seglen - 2;
      if (!w || !h || !comps) return 5;
      if ((size_t)w * h * comps > out_cap) return 6;
      BitReader br{buf + scan, len - scan};
      const int defaultdc = 1 << (precision - pt - 1);
      std::vector<int32_t> prev((size_t)w * comps), cur((size_t)w * comps);
      (void)comp_dc;
      for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x++) {
          for (int c = 0; c < comps; c++) {
            const Huff &hh = tables[tsel[c]];
            if (!hh.ok) return 7;
            int ssss = huff_decode(br, hh);
            int diff = extend(br.get(ssss), ssss);
            if (br.bad) return 8;
            int32_t pred;
            if (y == 0 && x == 0) pred = defaultdc;
            else if (x == 0) pred = prev[c];                       // above
            else if (y == 0) pred = cur[(size_t)(x - 1) * comps + c];
            else {
              const int32_t a = cur[(size_t)(x - 1) * comps + c];  // left
              const int32_t b = prev[(size_t)x * comps + c];       // above
              const int32_t cc = prev[(size_t)(x - 1) * comps + c];
              switch (predictor) {
                case 1: pred = a; break;
                case 2: pred = b; break;
                case 3: pred = cc; break;
                case 4: pred = a + b - cc; break;
                case 5: pred = a + ((b - cc) >> 1); break;
                case 6: pred = b + ((a - cc) >> 1); break;
                case 7: pred = (a + b) >> 1; break;
                default: pred = a; break;
              }
            }
            const int32_t v = (pred + diff) & 0xFFFF;
            cur[(size_t)x * comps + c] = v;
            out[((size_t)y * w + x) * comps + c] = (uint16_t)(v << pt);
          }
        }
        std::swap(prev, cur);
      }
      *o_w = w;
      *o_h = h;
      *o_comps = comps;
      return 0;
    } else if (marker == 0xFFD9) {
      return 9;
    } else {
      pos += 2 + seglen;
    }
  }
  return 10;
}

// ---------------------------------------------------------------------------
// Nikon NEF entropy coding (TIFF compression 34713).
//
// Format (public knowledge, dcraw nikon_load_raw / rawspeed
// NikonDecompressor): a Huffman-coded difference stream against a
// two-column predictor.  The six code tables below are fixed format
// constants; each row is 16 code-length counts (lengths 1..16) followed
// by the symbol values.  A value's low nibble is the magnitude bit
// count, the high nibble an extra left-shift used by the lossy
// "after-split" tables.  MakerNote tag 0x0096 carries: version bytes,
// vpred[2][2] initial predictors, the linearization curve, and (lossy
// v0x44/0x20) the row index where the coder switches to the companion
// table.

constexpr uint8_t kNikonTree[6][32] = {
    // 12-bit lossy
    {0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0,
     5, 4, 3, 6, 2, 7, 1, 0, 8, 9, 11, 10, 12},
    // 12-bit lossy after split
    {0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0,
     0x39, 0x5a, 0x38, 0x27, 0x16, 5, 4, 3, 2, 1, 0, 11, 12, 12},
    // 12-bit lossless
    {0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10, 11, 12},
    // 14-bit lossy
    {0, 1, 4, 3, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0,
     5, 6, 4, 7, 8, 3, 9, 2, 1, 0, 10, 11, 12, 13, 14},
    // 14-bit lossy after split
    {0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0,
     8, 0x5c, 0x4b, 0x3a, 0x29, 7, 6, 5, 4, 3, 2, 1, 0, 13, 14},
    // 14-bit lossless
    {0, 1, 4, 2, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0,
     7, 6, 8, 5, 9, 4, 10, 3, 11, 12, 2, 0, 1, 13, 14}};

// Raw MSB-first bitstream (no JPEG 0xFF stuffing); zero-fills past EOF,
// matching the tolerant tail handling cameras rely on.
struct NikonBits {
  const uint8_t *p;
  size_t n, pos = 0;
  uint64_t acc = 0;
  int nbits = 0;
  int get(int want) {
    if (want <= 0) return 0;
    while (nbits < want) {
      acc = (acc << 8) | (pos < n ? p[pos++] : 0);
      nbits += 8;
    }
    int v = (int)((acc >> (nbits - want)) & ((1u << want) - 1));
    nbits -= want;
    return v;
  }
};

static void nikon_build_huff(const uint8_t *row, Huff *h) {
  int counts[17] = {0};
  int total = 0;
  for (int i = 1; i <= 16; i++) {
    counts[i] = row[i - 1];
    total += counts[i];
  }
  for (int i = 0; i < total && i < 256; i++) h->values[i] = row[16 + i];
  int code = 0, k = 0;
  for (int i = 1; i <= 16; i++) {
    h->valptr[i] = k;
    h->mincode[i] = code;
    code += counts[i];
    k += counts[i];
    h->maxcode[i] = counts[i] ? code - 1 : -1;
    code <<= 1;
  }
  h->ok = true;
}

static int nikon_huff_decode(NikonBits &br, const Huff &h) {
  int code = br.get(1);
  int len = 1;
  while (len <= 16 && (h.maxcode[len] < 0 || code > h.maxcode[len])) {
    code = (code << 1) | br.get(1);
    len++;
  }
  if (len > 16) return 0;
  return h.values[h.valptr[len] + code - h.mincode[len]];
}

// returns 0 on success
static int nikon_34713_decode(const uint8_t *buf, size_t len,
                              const RawInfo *info, const uint8_t *data,
                              size_t data_len, uint16_t *out,
                              double *white_out) {
  if (!info->nikon_meta_off || info->nikon_meta_len < 14) return 32;
  if (info->nikon_meta_off + info->nikon_meta_len > len) return 32;
  const uint8_t *meta = buf + info->nikon_meta_off;
  size_t mlen = info->nikon_meta_len;
  Reader mr{meta, mlen, info->nikon_meta_le != 0};
  size_t mp = 0;
  const int v0 = meta[mp++], v1 = meta[mp++];
  if (v0 == 0x49 || v1 == 0x58) mp += 2110;  // D7000-era padding block
  int tree = (v0 == 0x46) ? 2 : 0;
  if (info->bits == 14) tree += 3;
  // predictors are 16-bit wraparound values, sign-reinterpreted at the
  // curve lookup (the camera relies on this modular arithmetic)
  uint16_t vpred[2][2];
  for (int i = 0; i < 4; i++, mp += 2)
    vpred[i >> 1][i & 1] = mr.u16(mp);
  int max = (1 << info->bits) & 0x7fff;
  std::vector<uint16_t> curve(0x8000);
  for (int i = 0; i < 0x8000; i++) curve[i] = (uint16_t)i;
  int csize = mr.u16(mp);
  mp += 2;
  int step = 0, split = 0;
  if (csize > 1) step = max / (csize - 1);
  if (v0 == 0x44 && v1 == 0x20 && step > 0) {
    // lossy: sparse knots at `step` spacing, linear interpolation
    for (int i = 0; i < csize && i * step < 0x8000; i++, mp += 2)
      curve[i * step] = mr.u16(mp);
    for (int i = 0; i < max; i++) {
      int r = i % step;
      curve[i] =
          (uint16_t)(((int)curve[i - r] * (step - r) +
                      (int)curve[i - r + step] * r) / step);
    }
    if (mlen >= 564) split = mr.u16(562);
  } else if (v0 != 0x46 && csize <= 0x4001) {
    for (int i = 0; i < csize; i++, mp += 2) curve[i] = mr.u16(mp);
    max = csize;
  }
  while (max > 2 && curve[max - 2] == curve[max - 1]) max--;
  *white_out = (double)curve[max > 0 ? max - 1 : 0];

  Huff huff;
  nikon_build_huff(kNikonTree[tree], &huff);
  NikonBits br{data, data_len};
  const size_t W = info->width, H = info->height;
  uint16_t hpred[2] = {0, 0};
  for (size_t row = 0; row < H; row++) {
    if (split && (int)row == split) {
      nikon_build_huff(kNikonTree[tree + 1], &huff);
      max += 32;  // min becomes 16; range widens by 2*min
    }
    for (size_t col = 0; col < W; col++) {
      int sym = nikon_huff_decode(br, huff);
      int slen = sym & 15;
      int shl = sym >> 4;
      int diff = ((br.get(slen - shl) << 1) + 1) << shl >> 1;
      if (slen > 0 && (diff & (1 << (slen - 1))) == 0)
        diff -= (1 << slen) - (shl ? 0 : 1);
      if (col < 2)
        hpred[col] = (vpred[row & 1][col] =
                          (uint16_t)(vpred[row & 1][col] + diff));
      else
        hpred[col & 1] = (uint16_t)(hpred[col & 1] + diff);
      int v = (int16_t)hpred[col & 1];
      if (v < 0) v = 0;
      if (v > 0x3fff) v = 0x3fff;
      out[row * W + col] = curve[v];
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Sony ARW2 (TIFF compression 32767).
//
// Format (public knowledge, dcraw sony_arw2_load_raw / rawspeed
// SonyArw2Decompressor): one byte per pixel; every 16-byte block holds
// 16 same-color pixels of a 32-column span (even columns, then odd):
// a 32-bit header packs the block's 11-bit max/min and their 4-bit
// positions; the other 14 pixels are 7-bit deltas off min, left-shifted
// by the smallest sh in [0,4) with (0x80 << sh) > max - min.  Decoded
// 11-bit values pass through the 5-segment tone curve whose interior
// knots come from tag 0x7010 (often inside the SR2-encrypted IFD).

static void sony_build_curve(const RawInfo *info, uint16_t *curve /*0x1000*/) {
  uint32_t knots[6] = {0, 0, 0, 0, 0, 0xfff};
  for (int i = 0; i < 4; i++)
    knots[i + 1] = info->has_sony_curve
                       ? ((info->sony_curve[i] >> 2) & 0xfff) : 0;
  for (int i = 0; i < 0x1000; i++) curve[i] = (uint16_t)i;
  for (int i = 0; i < 5; i++)
    for (uint32_t j = knots[i] + 1; j <= knots[i + 1] && j < 0x1000; j++)
      curve[j] = (uint16_t)(curve[j - 1] + (1 << i));
}

static int sony_arw2_decode(const RawInfo *info, const uint8_t *data,
                            size_t data_len, uint16_t *out,
                            double *white_out) {
  const size_t W = info->width, H = info->height;
  if (data_len < W * H) return 33;
  uint16_t curve[0x1000];
  sony_build_curve(info, curve);
  *white_out = (double)(curve[0xffe] >> 2);
  for (size_t row = 0; row < H; row++) {
    const uint8_t *dp = data + row * W;
    size_t col = 0;
    while (col + 30 < W) {
      uint32_t val = (uint32_t)dp[0] | (uint32_t)dp[1] << 8 |
                     (uint32_t)dp[2] << 16 | (uint32_t)dp[3] << 24;
      uint32_t vmax = val & 0x7ff;
      uint32_t vmin = (val >> 11) & 0x7ff;
      uint32_t imax = (val >> 22) & 0x0f;
      uint32_t imin = (val >> 26) & 0x0f;
      int sh = 0;
      while (sh < 4 && (uint32_t)(0x80u << sh) <= vmax - vmin) sh++;
      uint32_t pix[16];
      int bit = 30;
      for (int i = 0; i < 16; i++) {
        if ((uint32_t)i == imax) {
          pix[i] = vmax;
        } else if ((uint32_t)i == imin) {
          pix[i] = vmin;
        } else {
          // the last delta's high byte is never needed; guard instead
          // of reading past the 16-byte block
          uint32_t hi = ((bit >> 3) + 1 < 16)
                            ? (uint32_t)dp[(bit >> 3) + 1] << 8 : 0;
          uint32_t w16 = (uint32_t)dp[bit >> 3] | hi;
          pix[i] = (((w16 >> (bit & 7)) & 0x7f) << sh) + vmin;
          if (pix[i] > 0x7ff) pix[i] = 0x7ff;
          bit += 7;
        }
      }
      for (int i = 0; i < 16; i++, col += 2)
        out[row * W + col] = (uint16_t)(curve[pix[i] << 1] >> 2);
      col -= (col & 1) ? 1 : 31;
      dp += 16;
    }
  }
  return 0;
}

// SR2 private-IFD stream cipher (public knowledge, dcraw sony_decrypt /
// rawspeed SonyDecrypt): a 128-word LFSR pad seeded from tag 0x7221.
static void sony_decrypt_block(uint8_t *data, size_t nbytes, uint32_t key) {
  uint32_t pad[128];
  for (int p = 0; p < 4; p++) pad[p] = key = key * 48828125u + 1u;
  pad[3] = pad[3] << 1 | (pad[0] ^ pad[2]) >> 31;
  for (int p = 4; p < 127; p++)
    pad[p] = (pad[p - 4] ^ pad[p - 2]) << 1 | (pad[p - 3] ^ pad[p - 1]) >> 31;
  // pad words are consumed big-endian
  for (int p = 0; p < 127; p++)
    pad[p] = (pad[p] >> 24) | ((pad[p] >> 8) & 0xff00) |
             ((pad[p] << 8) & 0xff0000) | (pad[p] << 24);
  size_t nwords = nbytes / 4;
  int p = 127;
  for (size_t i = 0; i < nwords; i++, p++) {
    uint32_t w = pad[p & 127] = pad[(p + 1) & 127] ^ pad[(p + 65) & 127];
    uint8_t *d = data + 4 * i;
    d[0] ^= (uint8_t)w;
    d[1] ^= (uint8_t)(w >> 8);
    d[2] ^= (uint8_t)(w >> 16);
    d[3] ^= (uint8_t)(w >> 24);
  }
}

// --- Fujifilm lossless-compressed RAF (modern X/GFX bodies) -----------------
//
// Scheme per the published reverse-engineering of the Fuji codec
// (A. Danilchenko's fuji_compressed decoder, the basis of every open
// implementation; the reference consumes it via rawspeed —
// imageio_rawspeed.cc:692 — whose sources are NOT vendored in this
// checkout):
//   * the mosaic is cut into independent VERTICAL STRIPS (header
//     block_size columns each, compressed sizes in a table after the
//     header) so strips decode in parallel;
//   * samples are grouped into per-color "sample lines" (all samples of
//     one CFA color in one row of the strip); a line is predicted from
//     the previous same-color line with the same CFA row phase;
//   * each line is coded in TWO interleaved passes — even positions
//     from the previous line's neighborhood (c b d), then odd positions
//     from the already-decoded even neighbors (a g) + the previous line
//     (b) — so half the samples get current-line context;
//   * the prediction residual is coded with a per-context adaptive
//     Golomb-Rice code: the context ("gradient") is the pair of
//     quantized neighborhood differences (thresholds 0x12/0x43/0x114 —
//     the published q_points — 9 signed levels each, sign-folded to 41
//     contexts), each context keeping (sum, count) counters that set
//     the Rice k and halve at 64 (the published update rule); quotients
//     >= 16 escape to a raw bits-wide field.
//
// Layout/constants follow that description; the per-sample interpolants
// are the standard members of this family (documented inline).  Gate:
// bit-exact round-trip vs the independent Python encoder
// (tests/rawfixtures.py write_raf_compressed) on random mosaics — real
// camera files cannot be validated in this environment (no samples, no
// vendored rawspeed); the docstring of tests/test_rawdec.py says so.

struct FujiBits {  // big-endian MSB-first bitstream
  const uint8_t *p;
  size_t n, pos = 0;
  uint64_t acc = 0;
  int nb = 0;
  bool bad = false;
  uint32_t get(int k) {
    if (!k) return 0;
    while (nb < k) {
      acc = (acc << 8) | (pos < n ? p[pos] : 0);
      if (pos >= n) bad = true;
      pos++;
      nb += 8;
    }
    uint32_t v = (uint32_t)((acc >> (nb - k)) & ((1ull << k) - 1));
    nb -= k;
    return v;
  }
  int unary(int limit) {  // count 0s until a 1; -1 = escape (>= limit)
    int q = 0;
    while (q < limit) {
      if (get(1)) return q;
      if (bad) return -1;
      q++;
    }
    return -1;
  }
};

struct FujiGrad {
  uint32_t sum, cnt;
};

static int fuji_qlevel(int d) {  // signed quantized difference, -4..4
  int a = d < 0 ? -d : d;
  int q = a == 0 ? 0 : a < 0x12 ? 1 : a < 0x43 ? 2 : a < 0x114 ? 3 : 4;
  return d < 0 ? -q : q;
}

static int fuji_rice_k(const FujiGrad &g) {
  int k = 0;
  while (k < 12 && ((uint64_t)g.cnt << k) < g.sum) k++;
  return k;
}

static void fuji_grad_update(FujiGrad &g, int m) {
  g.sum += (uint32_t)m;
  g.cnt += 1;
  if (g.cnt >= 64) {
    g.sum >>= 1;
    g.cnt >>= 1;
  }
}

// decode one residual in context g; -> signed error, or INT32_MIN on
// stream corruption
static int fuji_get_err(FujiBits &br, FujiGrad &g, int bits) {
  int k = fuji_rice_k(g);
  int q = br.unary(16);
  uint32_t m;
  if (q < 0) m = br.get(bits + 1);       // escape: raw mapped value
  else m = ((uint32_t)q << k) | br.get(k);
  if (br.bad) return INT32_MIN;
  fuji_grad_update(g, (int)m);
  return (m & 1) ? -((int)(m >> 1)) - 1 : (int)(m >> 1);
}

static inline int fuji_clamp(int v, int maxv) {
  return v < 0 ? 0 : v > maxv ? maxv : v;
}

// Decode one strip: cols [x0, x1) of the full mosaic.
static int fuji_decode_strip(const uint8_t *data, size_t dlen,
                             const RawInfo *info, size_t x0, size_t x1,
                             uint16_t *out) {
  const size_t W = info->width, H = info->height;
  const int bits = (int)info->bits;
  const int maxv = (1 << bits) - 1;
  const int period = info->is_xtrans ? 6 : 2;
  FujiBits br{data, dlen};

  // per (color, row-phase) gradient banks: 41 contexts for the even
  // pass and 41 for the odd pass, plus the previous same-phase line
  const int NC = 3;
  std::vector<FujiGrad> grads((size_t)NC * period * 2 * 41,
                              FujiGrad{256, 1});
  std::vector<std::vector<uint16_t>> prev((size_t)NC * period);
  std::vector<uint16_t> line;

  for (size_t r = 0; r < H; r++) {
    int phase = (int)(r % period);
    for (int c = 0; c < NC; c++) {
      // gather this row's positions of color c inside the strip
      std::vector<uint32_t> xs;
      xs.reserve((x1 - x0) / 2 + 1);
      for (size_t x = x0; x < x1; x++) {
        int cc = info->is_xtrans
                     ? (int)info->xtrans[(r % 6) * 6 + (x % 6)]
                     : (int)info->cfa[(r % 2) * 2 + (x % 2)];
        if (cc == c) xs.push_back((uint32_t)(x - x0));
      }
      if (xs.empty()) continue;
      const size_t n = xs.size();
      std::vector<uint16_t> &pl = prev[(size_t)c * period + phase];
      const bool first = pl.size() != n;
      line.assign(n, 0);
      FujiGrad *ge = &grads[(((size_t)c * period + phase) * 2 + 0) * 41];
      FujiGrad *go = &grads[(((size_t)c * period + phase) * 2 + 1) * 41];

      // even pass: context = previous line (c b d)
      for (size_t i = 0; i < n; i += 2) {
        int b = first ? (i ? line[i - 2] : (1 << (bits - 1)))
                      : pl[i];
        int cL = first ? b : pl[i ? i - 1 : 0];
        int dR = first ? b : pl[i + 1 < n ? i + 1 : n - 1];
        int d1 = dR - b, d2 = b - cL;
        int q1 = fuji_qlevel(d1), q2 = fuji_qlevel(d2);
        int gidx = 9 * q1 + q2;
        int sign = gidx < 0 ? -1 : 1;
        if (gidx < 0) gidx = -gidx;
        int interp = first ? b : (2 * b + cL + dR) >> 2;
        int err = fuji_get_err(br, ge[gidx], bits);
        if (err == INT32_MIN) return 40;
        line[i] = (uint16_t)fuji_clamp(interp + sign * err, maxv);
      }
      // odd pass: context = even neighbors (a g) + previous line (b)
      for (size_t i = 1; i < n; i += 2) {
        int a = line[i - 1];
        int gR = i + 1 < n ? line[i + 1] : a;
        int b = first ? a : pl[i];
        int d1 = b - a, d2 = gR - b;
        int q1 = fuji_qlevel(d1), q2 = fuji_qlevel(d2);
        int gidx = 9 * q1 + q2;
        int sign = gidx < 0 ? -1 : 1;
        if (gidx < 0) gidx = -gidx;
        // average of the decoded flanks, pulled toward the line above
        // when it lies outside their range (the family's edge rule)
        int lo = a < gR ? a : gR, hi = a < gR ? gR : a;
        int interp = (b < lo || b > hi) ? (a + gR + 2 * b) >> 2
                                        : (a + gR) >> 1;
        int err = fuji_get_err(br, go[gidx], bits);
        if (err == INT32_MIN) return 40;
        line[i] = (uint16_t)fuji_clamp(interp + sign * err, maxv);
      }
      for (size_t i = 0; i < n; i++) out[r * W + x0 + xs[i]] = line[i];
      pl = line;
    }
  }
  return 0;
}

// Payload: BE header {u16 sig 0x4953, u8 version 1, u8 raw_type
// (1 = xtrans), u8 bits, u8 blocks_in_row, u16 block_size, u16 height,
// u16 width, u32 pad}, then u32 compressed-size table (blocks_in_row),
// then the concatenated strip streams.
static int fuji_compressed_decode(const uint8_t *data, size_t dlen,
                                  RawInfo *info, uint16_t *out) {
  if (dlen < 16) return 41;
  auto be16 = [&](size_t o) { return (uint32_t)(data[o] << 8 | data[o + 1]); };
  auto be32 = [&](size_t o) {
    return (uint32_t)data[o] << 24 | (uint32_t)data[o + 1] << 16 |
           (uint32_t)data[o + 2] << 8 | data[o + 3];
  };
  if (be16(0) != 0x4953 || data[2] != 1) return 42;
  uint32_t bits = data[4], nblocks = data[5];
  uint32_t bw = be16(6), h = be16(8), w = be16(10);
  if (h != info->height || w != info->width) return 43;
  if (!bits || bits > 16 || !nblocks || !bw) return 44;
  if ((size_t)(nblocks - 1) * bw >= w || (size_t)nblocks * bw < w) return 45;
  info->bits = bits;
  info->white = (1u << bits) - 1;
  size_t pos = 16;
  if (pos + 4ull * nblocks > dlen) return 46;
  std::vector<uint32_t> sizes(nblocks);
  for (uint32_t i = 0; i < nblocks; i++) sizes[i] = be32(pos + 4ull * i);
  pos += 4ull * nblocks;
  for (uint32_t s = 0; s < nblocks; s++) {
    if (pos + sizes[s] > dlen) return 47;
    size_t x0 = (size_t)s * bw;
    size_t x1 = x0 + bw < w ? x0 + bw : w;
    int rc = fuji_decode_strip(data + pos, sizes[s], info, x0, x1, out);
    if (rc) return rc;
    pos += sizes[s];
  }
  return 0;
}

// --- Canon CR3 (ISO-BMFF container + CRX-coded raw track) -------------------
//
// Container per the public CR3 structure documentation (L. Clévy's
// "Inside Canon RAW v3" + the ISO base-media spec; the reference reads
// CR3 via rawspeed/LibRaw — imageio_rawspeed.cc:692 /
// imageio_libraw.c:380 — neither vendored here):
//   ftyp(major 'crx ') / moov / uuid(85c0b687-820f-11e0-8111-f4ce462b6a48)
//   carrying Canon CNCV + CMT1..CMT4 boxes (each CMTn is a bare TIFF
//   blob: CMT1 = IFD0, CMT2 = ExifIFD), and trak/mdia/minf/stbl sample
//   tables whose stsd entry 'CRAW' (+ 'CMP1' codec params) describes
//   the raw track; stsz/co64 locate the payload inside mdat.
//
// Codec: the CRX *lossless* path codes the four half-res CFA subplanes
// (R G1 G2 B) independently, line-based, with per-sample K-adaptive
// Golomb-Rice residual coding (the LOCO/Rice adaptation family CRX
// belongs to per the public analyses).  This implementation uses the
// family's canonical members — median-edge-detector prediction, 2e/
// -2e-1 mapping, K' = K±1 Rice adaptation, 41-quotient escape (CRX's
// published escape threshold), plane streams delimited by ff02 markers
// — and is gated BIT-EXACT against the independent Python encoder in
// tests/rawfixtures.py (write_cr3).  Real camera files cannot be
// validated in this environment; see the test module docstring.

struct CrxBits {  // MSB-first
  const uint8_t *p;
  size_t n, pos = 0;
  uint64_t acc = 0;
  int nb = 0;
  bool bad = false;
  uint32_t get(int k) {
    if (!k) return 0;
    while (nb < k) {
      acc = (acc << 8) | (pos < n ? p[pos] : 0);
      if (pos >= n) bad = true;
      pos++;
      nb += 8;
    }
    uint32_t v = (uint32_t)((acc >> (nb - k)) & ((1ull << k) - 1));
    nb -= k;
    return v;
  }
  int unary(int limit) {
    int q = 0;
    while (q < limit) {
      if (get(1)) return q;
      if (bad) return -1;
      q++;
    }
    return -1;
  }
};

static int crx_adapt_k(int k, uint32_t m) {
  if ((m >> k) >= 2 && k < 15) return k + 1;
  if (k > 0 && (m << 1) < (1u << k)) return k - 1;
  return k;
}

static inline int crx_med(int a, int b, int c) {
  // JPEG-LS median edge detector
  int mx = a > b ? a : b, mn = a < b ? a : b;
  if (c >= mx) return mn;
  if (c <= mn) return mx;
  return a + b - c;
}

// one half-res subplane, pw x ph samples
static int crx_decode_plane(CrxBits &br, int pw, int ph, int bits,
                            uint16_t *plane) {
  const int maxv = (1 << bits) - 1;
  int k = 4;  // published CRX initial K
  for (int y = 0; y < ph; y++) {
    for (int x = 0; x < pw; x++) {
      int a = x ? plane[y * pw + x - 1] : (y ? plane[(y - 1) * pw] : 0);
      int b = y ? plane[(y - 1) * pw + x] : a;
      int c = (x && y) ? plane[(y - 1) * pw + x - 1] : b;
      int pred = (x || y) ? crx_med(a, b, c) : (1 << (bits - 1));
      int q = br.unary(41);
      uint32_t m;
      if (q < 0) m = br.get(bits + 1);
      else m = ((uint32_t)q << k) | br.get(k);
      if (br.bad) return 50;
      int e = (m & 1) ? -((int)(m >> 1)) - 1 : (int)(m >> 1);
      int v = pred + e;
      if (v < 0 || v > maxv) return 51;
      plane[y * pw + x] = (uint16_t)v;
      k = crx_adapt_k(k, m);
    }
  }
  return 0;
}

// payload: 4x { u32 0xFF020008, u32 plane_index, u32 stream_size } +
// streams; planes interleave back to the RGGB mosaic
static int crx_decode(const uint8_t *data, size_t dlen, RawInfo *info,
                      uint16_t *out) {
  const size_t W = info->width, H = info->height;
  if (W % 2 || H % 2) return 52;
  const int pw = (int)(W / 2), ph = (int)(H / 2);
  auto be32 = [&](size_t o) -> uint32_t {
    return o + 4 <= dlen ? (uint32_t)data[o] << 24 |
                               (uint32_t)data[o + 1] << 16 |
                               (uint32_t)data[o + 2] << 8 | data[o + 3]
                         : 0;
  };
  std::vector<uint16_t> plane((size_t)pw * ph);
  size_t pos = 0;
  static const int dy[4] = {0, 0, 1, 1}, dx[4] = {0, 1, 0, 1};
  for (int pi = 0; pi < 4; pi++) {
    if (pos + 12 > dlen) return 53;
    if (be32(pos) != 0xFF020008u) return 54;
    uint32_t idx = be32(pos + 4), sz = be32(pos + 8);
    if (idx != (uint32_t)pi || pos + 12 + sz > dlen) return 55;
    CrxBits br{data + pos + 12, sz};
    int rc = crx_decode_plane(br, pw, ph, (int)info->bits, plane.data());
    if (rc) return rc;
    for (int y = 0; y < ph; y++)
      for (int x = 0; x < pw; x++)
        out[(2 * y + dy[pi]) * W + 2 * x + dx[pi]] =
            plane[(size_t)y * pw + x];
    pos += 12 + sz;
  }
  return 0;
}

// minimal ISO-BMFF walk; boxes are BE {u32 size, 4cc type} (size 1 ->
// u64 largesize follows)
struct Box {
  uint32_t type;
  size_t payload, plen;
};

static bool bmff_next(const uint8_t *buf, size_t len, size_t pos,
                      Box *box, size_t *next) {
  if (pos + 8 > len) return false;
  uint64_t sz = (uint64_t)buf[pos] << 24 | (uint64_t)buf[pos + 1] << 16 |
                (uint64_t)buf[pos + 2] << 8 | buf[pos + 3];
  uint32_t ty = (uint32_t)buf[pos + 4] << 24 | (uint32_t)buf[pos + 5] << 16 |
                (uint32_t)buf[pos + 6] << 8 | buf[pos + 7];
  size_t hdr = 8;
  if (sz == 1) {
    if (pos + 16 > len) return false;
    sz = 0;
    for (int i = 0; i < 8; i++) sz = sz << 8 | buf[pos + 8 + i];
    hdr = 16;
  }
  if (sz < hdr || pos + sz > len) return false;
  box->type = ty;
  box->payload = pos + hdr;
  box->plen = (size_t)sz - hdr;
  *next = pos + (size_t)sz;
  return true;
}

static const uint8_t kCanonUuid[16] = {0x85, 0xc0, 0xb6, 0x87, 0x82, 0x0f,
                                       0x11, 0xe0, 0x81, 0x11, 0xf4, 0xce,
                                       0x46, 0x2b, 0x6a, 0x48};

struct Cr3Track {
  uint32_t w = 0, h = 0, bits = 0;
  uint64_t off = 0, size = 0;
  bool craw = false;
};

// parse one trak box -> CRAW geometry + sample location
static void cr3_parse_trak(const uint8_t *buf, size_t len, size_t p0,
                           size_t p1, Cr3Track *tk) {
  // find mdia/minf/stbl by recursive descent
  auto descend = [&](size_t a, size_t b, uint32_t want) -> std::pair<size_t, size_t> {
    size_t pos = a, nxt;
    Box bx;
    while (pos < b && bmff_next(buf, len, pos, &bx, &nxt)) {
      if (bx.type == want) return {bx.payload, bx.payload + bx.plen};
      pos = nxt;
    }
    return {0, 0};
  };
  auto mdia = descend(p0, p1, 0x6d646961);           // 'mdia'
  if (!mdia.first) return;
  auto minf = descend(mdia.first, mdia.second, 0x6d696e66);  // 'minf'
  if (!minf.first) return;
  auto stbl = descend(minf.first, minf.second, 0x7374626c);  // 'stbl'
  if (!stbl.first) return;
  auto be16 = [&](size_t o) { return (uint32_t)(buf[o] << 8 | buf[o + 1]); };
  auto be32 = [&](size_t o) {
    return (uint32_t)buf[o] << 24 | (uint32_t)buf[o + 1] << 16 |
           (uint32_t)buf[o + 2] << 8 | buf[o + 3];
  };
  size_t pos = stbl.first, nxt;
  Box bx;
  while (pos < stbl.second && bmff_next(buf, len, pos, &bx, &nxt)) {
    if (bx.type == 0x73747364 && bx.plen >= 16) {        // 'stsd'
      size_t e = bx.payload + 8;                         // ver/flags + count
      Box ent;
      size_t en;
      if (bmff_next(buf, len, e, &ent, &en) &&
          ent.type == 0x43524157) {                      // 'CRAW'
        tk->craw = true;
        // SampleEntry: 6 reserved + u16 data_ref; video: 16 pre-defined
        // then u16 width, u16 height
        size_t q = ent.payload + 6 + 2 + 16;
        if (q + 4 <= len) {
          tk->w = be16(q);
          tk->h = be16(q + 2);
        }
        // scan the CRAW entry for the CMP1 codec box (bits field)
        for (size_t s = ent.payload; s + 8 <= ent.payload + ent.plen; s++) {
          if (!memcmp(buf + s, "CMP1", 4)) {
            // our CMP1 layout: 4cc, u16 version, u16 bits
            if (s + 8 <= len) tk->bits = be16(s + 6);
            break;
          }
        }
      }
    } else if (bx.type == 0x7374737a && bx.plen >= 12) { // 'stsz'
      uint32_t fixed = be32(bx.payload + 4);
      uint32_t cnt = be32(bx.payload + 8);
      if (fixed) tk->size = fixed;
      else if (cnt >= 1 && bx.plen >= 16) tk->size = be32(bx.payload + 12);
    } else if (bx.type == 0x636f3634 && bx.plen >= 16) { // 'co64'
      uint64_t v = 0;
      for (int i = 0; i < 8; i++) v = v << 8 | buf[bx.payload + 8 + i];
      tk->off = v;
    } else if (bx.type == 0x7374636f && bx.plen >= 12) { // 'stco'
      tk->off = be32(bx.payload + 8);
    }
    pos = nxt;
  }
}

// CMTn boxes are bare TIFF blobs — reuse the IFD machinery
static void cr3_take_cmt(const uint8_t *buf, size_t len, size_t off,
                         size_t blen, int which, RawInfo *info) {
  if (off + blen > len || blen < 8) return;
  const uint8_t *t = buf + off;
  bool le = t[0] == 'I';
  Reader r{t, blen, le};
  if (r.u16(2) != 42) return;
  IFD ifd;
  size_t next = 0;
  if (!parse_ifd(r, r.u32(4), &ifd, &next)) return;
  auto str = [&](const Entry *e, char *dst, size_t cap) {
    if (!e) return;
    size_t n = e->count < cap - 1 ? e->count : cap - 1;
    if (e->value_off + n > blen) return;
    memcpy(dst, t + e->value_off, n);
    dst[n] = 0;
  };
  if (which == 1) {
    str(ifd.find(0x010F), info->maker, sizeof(info->maker));
    str(ifd.find(0x0110), info->model, sizeof(info->model));
  } else if (which == 2) {
    if (const Entry *iso = ifd.find(0x8827))
      info->iso = (uint32_t)entry_uint(r, *iso);
  }
}

static int cr3_info(const uint8_t *buf, size_t len, RawInfo *info,
                    uint64_t *strip_offsets, uint64_t *strip_counts) {
  memset(info, 0, sizeof(*info));
  info->container = 5;
  Cr3Track best;
  size_t pos = 0, nxt;
  Box bx;
  while (bmff_next(buf, len, pos, &bx, &nxt)) {
    if (bx.type == 0x6d6f6f76) {  // 'moov'
      size_t mp = bx.payload, mn;
      Box mb;
      while (mp < bx.payload + bx.plen && bmff_next(buf, len, mp, &mb, &mn)) {
        if (mb.type == 0x75756964 && mb.plen >= 16 &&
            !memcmp(buf + mb.payload, kCanonUuid, 16)) {
          size_t up = mb.payload + 16, un;
          Box ub;
          while (up < mb.payload + mb.plen &&
                 bmff_next(buf, len, up, &ub, &un)) {
            if (ub.type == 0x434d5431)        // 'CMT1'
              cr3_take_cmt(buf, len, ub.payload, ub.plen, 1, info);
            else if (ub.type == 0x434d5432)   // 'CMT2'
              cr3_take_cmt(buf, len, ub.payload, ub.plen, 2, info);
            up = un;
          }
        } else if (mb.type == 0x7472616b) {   // 'trak'
          Cr3Track tk;
          cr3_parse_trak(buf, len, mb.payload, mb.payload + mb.plen, &tk);
          // the raw track: CRAW entry with the largest sample
          if (tk.craw && tk.size > best.size) best = tk;
        }
        mp = mn;
      }
    }
    pos = nxt;
  }
  if (!best.craw || !best.w || !best.h || !best.off || !best.size)
    return 60;
  if (best.off + best.size > len) return 61;
  info->width = best.w;
  info->height = best.h;
  info->bits = best.bits ? best.bits : 14;
  info->compression = 0x4352;  // internal tag: CRX
  info->white = (1u << info->bits) - 1;
  info->cfa[0] = 0; info->cfa[1] = 1; info->cfa[2] = 1; info->cfa[3] = 2;
  info->wb[0] = info->wb[1] = info->wb[2] = 1.0;
  info->endian_le = 0;
  info->n_strips = 1;
  strip_offsets[0] = best.off;
  strip_counts[0] = best.size;
  if (!info->maker[0]) memcpy(info->maker, "Canon", 6);
  return 0;
}

// --- Pentax PEF (TIFF, compression 65535, MakerNote huffman) ----------------
//
// Container: a standard TIFF whose raw IFD carries Compression 65535;
// the huffman spec lives in the PENTAX MakerNote ("AOC\0" header) tag
// 0x0220: u16 (dep-12), 12 skip bytes, dep u16 left-aligned 12-bit code
// starts, dep u8 code lengths (the dcraw pentax semantics).  Payload:
// MSB-first ssss-coded diffs with two-row vertical predictors for the
// first two columns and horizontal predictors after (dcraw
// pentax_load_raw).  Gated bit-exact vs the Python encoder (write_pef).

static int pentax_decode(const uint8_t *buf, size_t len, RawInfo *info,
                         const uint64_t *strip_offsets,
                         const uint64_t *strip_counts, uint16_t *out) {
  if (!info->pentax_meta_off ||
      info->pentax_meta_off + 16 > len) return 110;
  const uint8_t *m = buf + info->pentax_meta_off;
  size_t mlen = len - (size_t)info->pentax_meta_off;
  const bool le = info->endian_le != 0;
  auto g2 = [&](size_t o) -> uint32_t {
    return le ? (uint32_t)(m[o] | m[o + 1] << 8)
              : (uint32_t)(m[o] << 8 | m[o + 1]);
  };
  const int dep = (int)((g2(0) + 12) & 15);
  size_t pos = 2 + 12;
  if (pos + dep * 3 > mlen) return 111;
  uint16_t bit0[16];
  uint8_t bit1[16];
  for (int c = 0; c < dep; c++) { bit0[c] = (uint16_t)g2(pos); pos += 2; }
  for (int c = 0; c < dep; c++) bit1[c] = m[pos++];
  uint16_t huff[4097];
  memset(huff, 0, sizeof(huff));
  for (int c = 0; c < dep; c++) {
    if (bit1[c] == 0 || bit1[c] > 12) return 112;
    for (uint32_t i = bit0[c];
         i <= ((bit0[c] + (4096u >> bit1[c]) - 1) & 4095u); i++)
      huff[i + 1] = (uint16_t)(bit1[c] << 8 | c);
  }

  const size_t W = info->width, H = info->height;
  if (info->n_strips < 1 || strip_offsets[0] >= len) return 2;
  size_t avail = strip_counts[0] ? strip_counts[0] : len - strip_offsets[0];
  if (strip_offsets[0] + avail > len) avail = len - strip_offsets[0];

  // raw MSB-first stream, no JPEG byte stuffing; zero-filled tail so
  // the final codes can peek past the end
  struct PefBits {
    const uint8_t *p;
    size_t n, pos = 0;
    uint64_t acc = 0;
    int nb = 0;
    bool bad = false;
    void fill(int want) {
      while (nb < want) {
        acc = (acc << 8) | (pos < n ? p[pos] : 0);
        pos++;
        nb += 8;
      }
    }
    uint32_t peek(int k) {
      fill(k);
      return (uint32_t)((acc >> (nb - k)) & ((1ull << k) - 1));
    }
    void drop(int k) { nb -= k; }
    uint32_t get(int k) {
      if (!k) return 0;
      uint32_t v = peek(k);
      drop(k);
      if (pos > n + 8) bad = true;  // far past the end: corrupt
      return v;
    }
  } br{buf + strip_offsets[0], avail};

  auto ljdiff = [&]() -> int {
    uint32_t peek = br.peek(12);
    uint16_t e = huff[1 + peek];
    int l = e >> 8, v = e & 0xFF;
    if (l == 0 || l > 12) { br.bad = true; return 0; }
    br.drop(l);
    if (v == 0) return 0;
    int diff = (int)br.get(v);
    if (!(diff & (1 << (v - 1)))) diff -= (1 << v) - 1;
    return diff;
  };

  int vpred[2][2] = {{0, 0}, {0, 0}}, hpred[2] = {0, 0};
  const int maxv = (1 << info->bits) - 1;
  for (size_t row = 0; row < H; row++)
    for (size_t col = 0; col < W; col++) {
      const int diff = ljdiff();
      if (br.bad) return 113;
      if (col < 2) hpred[col] = vpred[row & 1][col] += diff;
      else hpred[col & 1] += diff;
      if (hpred[col & 1] > maxv || hpred[col & 1] < 0) return 114;
      out[row * W + col] = (uint16_t)hpred[col & 1];
    }
  return 0;
}

static void copy_str(const Reader &r, const Entry &e, char *dst, size_t cap) {
  size_t n = e.count < cap - 1 ? e.count : cap - 1;
  if (e.value_off + n > r.n) return;
  memcpy(dst, r.p + e.value_off, n);
  dst[n] = 0;
}

// --- Panasonic RW2 (TIFF magic 85, v4 12-bit bitstream) ---------------------
//
// Container per the public RW2 structure (exiftool PanasonicRaw tags;
// the reference reads RW2 via rawspeed — imageio_rawspeed.cc:692):
// IFD0 carries sensor geometry (0x0002/0x0003), CFA (0x0009), bits
// (0x000A), RawFormat (0x002D), per-channel blacks (0x001C-0x001E,
// +15 offset per rawspeed), WB levels (0x0024-0x0026) and the raw
// payload offset (0x0118, data to EOF).  Payload: the v4 bitstream —
// 0x4000-byte sections with a split load (first 0x1ff8 file bytes land
// at buffer offset 0x2008), a down-counting 17-bit cursor, and
// 14-pixel groups of two interleaved predictors with 4-bit escalation
// (the dcraw-documented pana_bits/panasonic structure; the intra-
// section bit order is normalized to contiguous LSB-first and fields
// never straddle sections — the exact window arithmetic cannot be
// validated without real files in this environment).  Gated
// bit-exact vs the independent Python encoder (tests/rawfixtures.py
// write_rw2); real files can't be validated in this environment.

struct PanaBits {
  const uint8_t *data;
  size_t len, pos = 0;
  uint8_t buf[0x4002];
  int vbits = 0;
  static const int kLoadFlags = 0x2008;
  void load() {
    memset(buf, 0, sizeof(buf));
    const size_t n1 = 0x4000 - kLoadFlags;  // 0x1ff8
    for (size_t i = 0; i < n1 && pos + i < len; i++)
      buf[kLoadFlags + i] = data[pos + i];
    for (size_t i = 0; i < (size_t)kLoadFlags && pos + n1 + i < len; i++)
      buf[i] = data[pos + n1 + i];
    pos += 0x4000;
  }
  unsigned get(int nbits) {
    if (!nbits) return 0;
    // a field never straddles sections: short leftovers are padding
    if (vbits && vbits < nbits) vbits = 0;
    if (!vbits) {
      load();
      vbits = 0x20000;
    }
    const int p0 = 0x20000 - vbits;  // bits consumed in this section
    vbits -= nbits;
    const int byte = p0 >> 3;
    return ((buf[byte] | buf[byte + 1] << 8) >> (p0 & 7)) &
           ~((~0u) << nbits);
  }
};

static int pana_v4_decode(const uint8_t *data, size_t dlen, RawInfo *info,
                          uint16_t *out) {
  const size_t W = info->width, H = info->height;
  PanaBits br{data, dlen};
  int sh = 0, pred[2] = {0, 0}, nonz[2] = {0, 0};
  for (size_t row = 0; row < H; row++)
    for (size_t col = 0; col < W; col++) {
      const int i = (int)(col % 14);
      if (i == 0) pred[0] = pred[1] = nonz[0] = nonz[1] = 0;
      if (i % 3 == 2) sh = 4 >> (3 - (int)br.get(2));
      if (nonz[i & 1]) {
        const int j = (int)br.get(8);
        if (j) {
          pred[i & 1] -= 0x80 << sh;
          if (pred[i & 1] < 0 || sh == 4) pred[i & 1] &= ~((-1) << sh);
          pred[i & 1] += j << sh;
        }
      } else if ((nonz[i & 1] = (int)br.get(8)) != 0 || i > 11) {
        pred[i & 1] = nonz[i & 1] << 4 | (int)br.get(4);
      }
      if (pred[i & 1] > 4098) return 70;
      out[row * W + col] = (uint16_t)pred[i & 1];
    }
  return 0;
}

static int rw2_info(const uint8_t *buf, size_t len, const Reader &r,
                    RawInfo *info, uint64_t *strip_offsets,
                    uint64_t *strip_counts) {
  memset(info, 0, sizeof(*info));
  info->container = 7;
  info->endian_le = 1;
  IFD ifd;
  size_t next = 0;
  if (!parse_ifd(r, r.u32(4), &ifd, &next)) return 80;
  auto u = [&](uint16_t tag, uint32_t dflt) -> uint32_t {
    const Entry *e = ifd.find(tag);
    return e ? entry_uint(r, *e) : dflt;
  };
  info->width = u(0x0002, 0);
  info->height = u(0x0003, 0);
  if (!info->width || !info->height) return 81;
  info->bits = u(0x000A, 12);
  const uint32_t raw_format = u(0x002D, 4);
  if (raw_format != 4) return 82;  // only the v4 bitstream is supported
  // CFA tag 0x0009: 1 RGGB / 2 GRBG / 3 GBRG / 4 BGGR (exiftool)
  static const uint8_t kCfa[5][4] = {
      {0, 1, 1, 2}, {0, 1, 1, 2}, {1, 0, 2, 1}, {1, 2, 0, 1}, {2, 1, 1, 0}};
  uint32_t cfa_id = u(0x0009, 1);
  if (cfa_id > 4) cfa_id = 1;
  for (int i = 0; i < 4; i++) info->cfa[i] = kCfa[cfa_id][i];
  // per-channel blacks carry a +15 offset in the raw data (rawspeed)
  const double b_r = u(0x001C, 0) + 15.0, b_g = u(0x001D, 0) + 15.0,
               b_b = u(0x001E, 0) + 15.0;
  info->black = (b_r + 2.0 * b_g + b_b) / 4.0;
  // 0x24-0x26 are per-channel WB *levels*; multiplier = level/green.
  // info->wb is neutral-style (the loader inverts), so store green/level.
  const double wb_r = u(0x0024, 0), wb_g = u(0x0025, 0),
               wb_b = u(0x0026, 0);
  if (wb_r > 0 && wb_g > 0 && wb_b > 0) {
    info->wb[0] = wb_g / wb_r;
    info->wb[1] = 1.0;
    info->wb[2] = wb_g / wb_b;
  } else {
    info->wb[0] = info->wb[1] = info->wb[2] = 1.0;
  }
  info->iso = u(0x0017, 0);
  if (const Entry *e = ifd.find(0x010F))
    copy_str(r, *e, info->maker, sizeof(info->maker));
  if (const Entry *e = ifd.find(0x0110))
    copy_str(r, *e, info->model, sizeof(info->model));
  if (!info->maker[0]) memcpy(info->maker, "Panasonic", 10);
  info->white = (1u << info->bits) - 1;
  info->compression = 0x5061;  // internal tag: Panasonic v4
  const uint32_t off = u(0x0118, 0);
  if (!off || off >= len) return 83;
  info->n_strips = 1;
  strip_offsets[0] = off;
  strip_counts[0] = len - off;
  return 0;
}

// --- Olympus ORF (TIFF magic 'RO'/'RS', packed or compressed) ---------------
//
// Container: a standard TIFF walk whose header magic is 0x4F52/0x5352
// instead of 42.  Payload selection per the public rawspeed OrfDecoder
// rule: strip size == W*H*2 -> plain 16-bit; >= 12-bit packed size ->
// LSB-first packed 12; smaller -> the Olympus predictive codec
// (3-bit sign/low + leading-zero high code with a 12-zero escape, two
// interleaved carry chains, W/N/NW gradient predictor — the
// dcraw-documented olympus semantics).  Gated bit-exact vs the Python
// encoder (write_orf); real files can't be validated here.

struct OlyBits {  // MSB-first
  const uint8_t *p;
  size_t n, pos = 0;
  uint64_t acc = 0;
  int nb = 0;
  bool bad = false;
  unsigned get(int k) {
    if (!k) return 0;
    while (nb < k) {
      acc = (acc << 8) | (pos < n ? p[pos] : 0);
      if (pos >= n) bad = true;
      pos++;
      nb += 8;
    }
    unsigned v = (unsigned)((acc >> (nb - k)) & ((1ull << k) - 1));
    nb -= k;
    return v;
  }
  int high_code() {  // leading zeros before a 1, 12 zeros = escape
    for (int z = 0; z < 12; z++) {
      if (get(1)) return z;
      if (bad) return -1;
    }
    return 12;
  }
};

static int olympus_decode(const uint8_t *data, size_t dlen, RawInfo *info,
                          uint16_t *out) {
  const size_t W = info->width, H = info->height;
  if (dlen < 8) return 90;
  OlyBits br{data + 7, dlen - 7};  // 7 junk bytes lead the stream
  int acarry[2][3];
  for (size_t row = 0; row < H; row++) {
    memset(acarry, 0, sizeof(acarry));
    for (size_t col = 0; col < W; col++) {
      int *carry = acarry[col & 1];
      const int i = 2 * (carry[2] < 3);
      int nbits;
      for (nbits = 2 + i; (uint16_t)carry[0] >> (nbits + i); nbits++) {
      }
      const unsigned three = br.get(3);
      const int low = three & 3;
      const int sign = (three & 4) ? -1 : 0;
      int high = br.high_code();
      if (high < 0 || br.bad) return 91;
      if (high == 12) high = (int)br.get(16 - nbits) >> 1;
      carry[0] = (high << nbits) | (int)br.get(nbits);
      const int diff = (carry[0] ^ sign) + carry[1];
      carry[1] = (diff * 3 + carry[1]) >> 5;
      carry[2] = carry[0] > 16 ? 0 : carry[2] + 1;
      int pred;
      if (row < 2 && col < 2) pred = 0;
      else if (row < 2) pred = out[row * W + col - 2];
      else if (col < 2) pred = out[(row - 2) * W + col];
      else {
        const int w_ = out[row * W + col - 2];
        const int n_ = out[(row - 2) * W + col];
        const int nw = out[(row - 2) * W + col - 2];
        if ((w_ < nw && nw < n_) || (n_ < nw && nw < w_)) {
          if (abs(w_ - nw) > 32 || abs(n_ - nw) > 32) pred = w_ + n_ - nw;
          else pred = (w_ + n_) >> 1;
        } else {
          pred = abs(w_ - nw) > abs(n_ - nw) ? w_ : n_;
        }
      }
      const int v = pred + ((diff << 2) | low);
      if (v >> 12) return 92;
      out[row * W + col] = (uint16_t)v;
    }
  }
  return 0;
}

}  // namespace

extern "C" {


// --- RAF (Fujifilm) container ----------------------------------------------
// Layout: "FUJIFILMCCD-RAW " magic, format version, camera id, model
// string; big-endian directory at 0x54: jpeg off/len, meta off/len,
// cfa off/len.  The meta block is a BE record list (u32 count; then
// u16 tag, u16 size, payload): 0x0100 = raw (height, width) u16 pair,
// 0x0131 = 6x6 X-Trans pattern, 0x0115 = bits per sample.
static int raf_info(const uint8_t *buf, size_t len, RawInfo *info,
                    uint64_t *strip_offsets, uint64_t *strip_counts) {
  auto be32 = [&](size_t o) -> uint32_t {
    return o + 4 <= len ? ((uint32_t)buf[o] << 24 | (uint32_t)buf[o + 1] << 16 |
                           (uint32_t)buf[o + 2] << 8 | buf[o + 3])
                        : 0;
  };
  auto be16 = [&](size_t o) -> uint32_t {
    return o + 2 <= len ? (uint32_t)(buf[o] << 8 | buf[o + 1]) : 0;
  };
  memset(info, 0, sizeof(*info));
  info->container = 2;
  memcpy(info->maker, "FUJIFILM", 9);
  size_t mlen = 32;
  size_t mo = 0x1C;
  for (size_t i = 0; i < mlen - 1 && mo + i < len; i++)
    info->model[i] = (char)buf[mo + i];
  uint32_t meta_off = be32(0x5C), meta_len = be32(0x60);
  uint32_t cfa_off = be32(0x64), cfa_len = be32(0x68);
  if (!meta_off || !cfa_off || meta_off >= len || cfa_off >= len) return 20;
  uint32_t nrec = be32(meta_off);
  if (nrec > 512) return 21;
  size_t pos = meta_off + 4;
  info->bits = 16;
  info->endian_le = 1;
  for (uint32_t i = 0; i < nrec && pos + 4 <= len
                       && pos + 4 <= (size_t)meta_off + meta_len; i++) {
    uint32_t tag = be16(pos), size = be16(pos + 2);
    size_t data = pos + 4;
    if (tag == 0x0100 && size >= 4) {   // raw dims (height, width)
      info->height = be16(data);
      info->width = be16(data + 2);
    } else if (tag == 0x0115 && size >= 2) {
      uint32_t b = be16(data);
      if (b >= 8 && b <= 16) info->bits = b;
    } else if (tag == 0x0131 && size >= 36) {  // X-Trans pattern
      info->is_xtrans = 1;
      for (int k = 0; k < 36 && data + k < len; k++)
        info->xtrans[k] = buf[data + k];
    }
    pos = data + size;
  }
  if (!info->width || !info->height) return 22;
  if (!info->is_xtrans) {
    info->cfa[0] = 0; info->cfa[1] = 1; info->cfa[2] = 1; info->cfa[3] = 2;
  }
  info->compression = 1;  // uncompressed payload (packed handled by bits)
  // lossless-compressed payload (modern X/GFX default): the CFA section
  // starts with the fuji_compressed header (BE 0x4953, version 1)
  if (cfa_off + 4 <= len && be16(cfa_off) == 0x4953 && buf[cfa_off + 2] == 1)
    info->compression = 0x4653;  // internal tag: Fuji lossless
  info->white = (1u << info->bits) - 1;
  info->wb[0] = info->wb[1] = info->wb[2] = 1.0;
  info->n_strips = 1;
  strip_offsets[0] = cfa_off;
  strip_counts[0] = cfa_len ? cfa_len : (len - cfa_off);
  return 0;
}

// Walk IFDs; pick the raw IFD (largest mosaic, or the CR2 raw IFD).
// Returns 0 on success.  strip_offsets/strip_counts hold >= 64 entries.
int rawdec_info(const uint8_t *buf, size_t len, RawInfo *info,
                uint64_t *strip_offsets, uint64_t *strip_counts) {
  if (len < 16) return 1;
  if (!memcmp(buf, "FUJIFILMCCD-RAW", 15))
    return raf_info(buf, len, info, strip_offsets, strip_counts);
  // CR3: ISO-BMFF with ftyp major brand 'crx '
  if (!memcmp(buf + 4, "ftyp", 4) && !memcmp(buf + 8, "crx ", 4))
    return cr3_info(buf, len, info, strip_offsets, strip_counts);
  Reader r{buf, len, buf[0] == 'I'};
  if (!((buf[0] == 'I' && buf[1] == 'I') || (buf[0] == 'M' && buf[1] == 'M')))
    return 1;
  const uint16_t tiff_magic = r.u16(2);
  if (tiff_magic == 85)  // Panasonic RW2 ("IIU\0")
    return rw2_info(buf, len, r, info, strip_offsets, strip_counts);
  // Olympus ORF: "IIRO"/"IIRS"/"MMOR" byte-order + magic variants
  const bool is_orf = tiff_magic == 0x4F52 || tiff_magic == 0x5352;
  if (tiff_magic != 42 && !is_orf) return 1;
  const bool is_cr2 = len > 12 && buf[8] == 'C' && buf[9] == 'R';

  std::vector<IFD> ifds;
  std::vector<bool> mainchain;
  // main chain first (order matters for CR2: the raw is the LAST
  // chained IFD), then SubIFDs (NEF/ARW/DNG raw location)
  {
    size_t off = r.u32(4);
    int guard = 0;
    std::vector<size_t> subs;
    while (off && off < len && guard++ < 16) {
      IFD ifd;
      size_t next = 0;
      if (!parse_ifd(r, off, &ifd, &next)) break;
      if (const Entry *sub = ifd.find(0x014A))
        for (uint32_t i = 0; i < sub->count && i < 8; i++)
          subs.push_back(entry_uint(r, *sub, i));
      ifds.push_back(std::move(ifd));
      mainchain.push_back(true);
      off = next;
    }
    for (size_t so : subs) {
      if (!so || so >= len) continue;
      IFD ifd;
      size_t next = 0;
      if (!parse_ifd(r, so, &ifd, &next)) continue;
      ifds.push_back(std::move(ifd));
      mainchain.push_back(false);
    }
  }
  const IFD *best = nullptr;
  if (is_cr2) {
    // CR2: raw = last main-chain IFD with old-JPEG compression (6)
    for (size_t i = 0; i < ifds.size(); i++) {
      const Entry *cmp = ifds[i].find(0x0103);
      if (mainchain[i] && cmp && entry_uint(r, *cmp) == 6
          && ifds[i].find(0x0111))
        best = &ifds[i];
    }
  }
  uint64_t best_pix = 0;
  if (!best) {
    for (auto &ifd : ifds) {
      const Entry *we = ifd.find(0x0100), *he = ifd.find(0x0101);
      if (!we || !he || !ifd.find(0x0111)) continue;
      const Entry *spp = ifd.find(0x0115);
      if (spp && entry_uint(r, *spp) != 1) continue;  // mosaic = 1 sample
      const Entry *pi = ifd.find(0x0106);  // PhotometricInterpretation
      if (pi) {
        uint32_t v = entry_uint(r, *pi);
        if (v != 32803 && v != 1) continue;  // CFA or greyscale only
      }
      uint64_t pix = (uint64_t)entry_uint(r, *we) * entry_uint(r, *he);
      if (pix > best_pix) {
        best_pix = pix;
        best = &ifd;
      }
    }
  }
  if (!best) return 2;

  memset(info, 0, sizeof(*info));
  info->container = is_cr2 ? 1 : (is_orf ? 6 : 0);
  info->endian_le = r.le ? 1 : 0;
  const Entry *we = best->find(0x0100), *he = best->find(0x0101);
  info->width = we ? entry_uint(r, *we) : 0;
  info->height = he ? entry_uint(r, *he) : 0;
  if ((!info->width || !info->height) && best->find(0x0111)) {
    // CR2 raw IFDs carry no dimension tags: read the LJ92 SOF3 header
    const Entry *so_ = best->find(0x0111);
    size_t off = entry_uint(r, *so_, 0);
    // scan markers for SOF3 (0xFFC3)
    size_t pos = off;
    while (pos + 4 < len && pos < off + (1 << 20)) {
      if (buf[pos] != 0xFF) break;
      int marker = buf[pos + 1];
      if (marker == 0xD8) { pos += 2; continue; }
      int seglen = (buf[pos + 2] << 8) | buf[pos + 3];
      if (marker == 0xC3) {
        int hj = (buf[pos + 5] << 8) | buf[pos + 6];
        int wj = (buf[pos + 7] << 8) | buf[pos + 8];
        int comps = buf[pos + 9];
        info->height = hj;
        info->width = (uint32_t)wj * comps;
        break;
      }
      pos += 2 + seglen;
    }
  }
  if (!info->width || !info->height) return 3;
  const Entry *bps = best->find(0x0102);
  info->bits = bps ? entry_uint(r, *bps) : 16;
  const Entry *cmp = best->find(0x0103);
  info->compression = cmp ? entry_uint(r, *cmp) : 1;
  info->white = (1u << info->bits) - 1;
  info->wb[0] = info->wb[1] = info->wb[2] = 1.0;
  info->cfa[0] = 0; info->cfa[1] = 1; info->cfa[2] = 1; info->cfa[3] = 2;

  if (const Entry *e = best->find(0x828D)) {  // CFARepeatPatternDim
    if (e->count >= 2 && entry_uint(r, *e, 0) == 6) info->is_xtrans = 1;
  }
  if (const Entry *e = best->find(0x828E)) {  // CFAPattern
    if (info->is_xtrans && e->count >= 36) {
      for (int i = 0; i < 36; i++) info->xtrans[i] = entry_uint(r, *e, i);
    } else {
      for (int i = 0; i < 4 && i < (int)e->count; i++)
        info->cfa[i] = entry_uint(r, *e, i);
    }
  }
  if (const Entry *e = best->find(0xC61A))  // BlackLevel
    info->black = entry_rational(r, *e, 0);
  if (const Entry *e = best->find(0xC61D))  // WhiteLevel
    info->white = entry_uint(r, *e);
  if (const Entry *e = best->find(0xC68D))  // ActiveArea (t, l, b, r)
    for (int i = 0; i < 4 && i < (int)e->count; i++)
      info->crop[i] = entry_uint(r, *e, i);
  if (const Entry *e = best->find(0xC640))  // Canon CR2 slices
    for (int i = 0; i < 3 && i < (int)e->count; i++)
      info->cr2_slices[i] = entry_uint(r, *e, i);

  // root-IFD color tags (DNG stores them on IFD0)
  for (auto &ifd : ifds) {
    if (const Entry *e = ifd.find(0xC628))  // AsShotNeutral
      for (int i = 0; i < 3 && i < (int)e->count; i++)
        info->wb[i] = entry_rational(r, *e, i);
    if (const Entry *e = ifd.find(0xC622))  // ColorMatrix1 (XYZ->cam)
      if (e->count >= 9 && info->cam_to_xyz[0] == 0.0) {
        double m[9];
        for (int i = 0; i < 9; i++) m[i] = entry_rational(r, *e, i);
        // invert 3x3
        double det = m[0] * (m[4] * m[8] - m[5] * m[7]) -
                     m[1] * (m[3] * m[8] - m[5] * m[6]) +
                     m[2] * (m[3] * m[7] - m[4] * m[6]);
        if (det != 0.0) {
          double inv[9] = {
              (m[4] * m[8] - m[5] * m[7]) / det,
              (m[2] * m[7] - m[1] * m[8]) / det,
              (m[1] * m[5] - m[2] * m[4]) / det,
              (m[5] * m[6] - m[3] * m[8]) / det,
              (m[0] * m[8] - m[2] * m[6]) / det,
              (m[2] * m[3] - m[0] * m[5]) / det,
              (m[3] * m[7] - m[4] * m[6]) / det,
              (m[1] * m[6] - m[0] * m[7]) / det,
              (m[0] * m[4] - m[1] * m[3]) / det};
          memcpy(info->cam_to_xyz, inv, sizeof(inv));
        }
      }
    if (const Entry *e = ifd.find(0x8827))  // ISO
      info->iso = entry_uint(r, *e);
    if (const Entry *e = ifd.find(0x010F))  // Make
      if (!info->maker[0]) copy_str(r, *e, info->maker, sizeof(info->maker));
    if (const Entry *e = ifd.find(0x0110))  // Model
      if (!info->model[0]) copy_str(r, *e, info->model, sizeof(info->model));
  }
  // CR2's raw IFD carries no dimension tags beyond the LJ92 stream's own
  // SOF3; width/height are refined by rawdec_decode.  NEF = Nikon TIFF,
  // ARW = Sony TIFF.
  if (!is_cr2) {
    if (!strncmp(info->maker, "NIKON", 5)) info->container = 3;
    else if (!strncmp(info->maker, "SONY", 4)) info->container = 4;
  }

  if (!strncmp(info->maker, "PENTAX", 6) && info->compression == 65535) {
    // PEF huffman spec: ExifIFD -> MakerNote ("AOC\0" + order mark,
    // IFD entries with file-absolute value offsets) -> tag 0x0220
    for (auto &ifd : ifds) {
      const Entry *ex = ifd.find(0x8769);
      if (!ex) continue;
      size_t eoff = entry_uint(r, *ex);
      IFD exif;
      size_t nx = 0;
      if (eoff >= len || !parse_ifd(r, eoff, &exif, &nx)) continue;
      const Entry *mn = exif.find(0x927C);
      if (!mn) continue;
      size_t mo = mn->value_off;
      if (mo + 8 < len && !memcmp(buf + mo, "AOC\0", 4)) {
        Reader pr{buf, len, buf[mo + 4] == 'I'};
        IFD mifd;
        size_t nn = 0;
        if (parse_ifd(pr, mo + 6, &mifd, &nn)) {
          if (const Entry *ht = mifd.find(0x0220)) {
            info->pentax_meta_off = ht->value_off;
            info->pentax_meta_len = ht->count;
          }
        }
      }
      break;
    }
  }

  if (info->container == 3) {
    // Nikon linearization meta: ExifIFD (0x8769) -> MakerNote (0x927C,
    // "Nikon\0" header + embedded TIFF at +10 with self-relative
    // offsets; headerless fallback uses file-absolute offsets) ->
    // tag 0x0096.
    for (auto &ifd : ifds) {
      const Entry *ex = ifd.find(0x8769);
      if (!ex) continue;
      size_t eoff = entry_uint(r, *ex);
      IFD exif;
      size_t nx = 0;
      if (eoff >= len || !parse_ifd(r, eoff, &exif, &nx)) continue;
      const Entry *mn = exif.find(0x927C);
      if (!mn) continue;
      size_t mo = mn->value_off;
      if (mo + 18 < len && !memcmp(buf + mo, "Nikon\0", 6)) {
        size_t base = mo + 10;
        Reader nr{buf + base, len - base, buf[base] == 'I'};
        bool valid = ((buf[base] == 'I' && buf[base + 1] == 'I') ||
                      (buf[base] == 'M' && buf[base + 1] == 'M')) &&
                     nr.u16(2) == 42;
        IFD mifd;
        size_t nn = 0;
        if (valid && parse_ifd(nr, nr.u32(4), &mifd, &nn)) {
          if (const Entry *lt = mifd.find(0x0096)) {
            info->nikon_meta_off = base + lt->value_off;
            info->nikon_meta_len = lt->count;
            info->nikon_meta_le = nr.le ? 1 : 0;
          }
        }
      } else if (mo < len) {
        IFD mifd;
        size_t nn = 0;
        if (parse_ifd(r, mo, &mifd, &nn)) {
          if (const Entry *lt = mifd.find(0x0096)) {
            info->nikon_meta_off = lt->value_off;
            info->nikon_meta_len = lt->count;
            info->nikon_meta_le = r.le ? 1 : 0;
          }
        }
      }
      break;
    }
  }

  if (info->container == 4) {
    // Sony tone curve (tag 0x7010): plain IFDs first, then the
    // SR2Private chain (0xC634 -> sub-IFD with 0x7200 offset / 0x7201
    // length / 0x7221 key -> LFSR-decrypted hidden IFD whose entry
    // offsets are file-absolute).
    auto take_curve = [&](const Reader &rr, const IFD &ifd) {
      const Entry *tc = ifd.find(0x7010);
      if (!tc || tc->count < 4) return false;
      for (int i = 0; i < 4; i++)
        info->sony_curve[i] = entry_uint(rr, *tc, i);
      info->has_sony_curve = 1;
      return true;
    };
    bool found = false;
    for (auto &ifd : ifds)
      if (take_curve(r, ifd)) { found = true; break; }
    if (!found) {
      for (auto &ifd : ifds) {
        const Entry *sr2 = ifd.find(0xC634);
        if (!sr2) continue;
        size_t soff = entry_uint(r, *sr2);
        IFD priv;
        size_t np = 0;
        if (soff >= len || !parse_ifd(r, soff, &priv, &np)) continue;
        const Entry *eo = priv.find(0x7200);
        const Entry *el = priv.find(0x7201);
        const Entry *ek = priv.find(0x7221);
        if (!eo || !el || !ek) continue;
        size_t doff = entry_uint(r, *eo);
        size_t dlen = entry_uint(r, *el);
        uint32_t key = entry_uint(r, *ek);
        if (doff + dlen > len || dlen < 8) continue;
        std::vector<uint8_t> copy(buf, buf + len);
        sony_decrypt_block(copy.data() + doff, dlen, key);
        Reader dr{copy.data(), len, r.le};
        IFD hidden;
        size_t nh = 0;
        if (parse_ifd(dr, doff, &hidden, &nh)) take_curve(dr, hidden);
        break;
      }
    }
  }

  const Entry *so = best->find(0x0111);
  const Entry *sc = best->find(0x0117);
  uint32_t n = so ? so->count : 0;
  if (n > 64) n = 64;
  info->n_strips = n;
  for (uint32_t i = 0; i < n; i++) {
    strip_offsets[i] = entry_uint(r, *so, i);
    strip_counts[i] = sc ? entry_uint(r, *sc, i) : 0;
  }
  // rows per strip for decode()
  return 0;
}

// Decode the raw mosaic into out (width*height uint16).  Returns 0 on ok.
// May refine info->white (vendor curves define the true ceiling).
int rawdec_decode(const uint8_t *buf, size_t len, RawInfo *info,
                  const uint64_t *strip_offsets, const uint64_t *strip_counts,
                  uint32_t rows_per_strip, uint16_t *out) {
  const size_t W = info->width, H = info->height;
  if (info->compression == 65535) {  // Pentax PEF
    return pentax_decode(buf, len, info, strip_offsets, strip_counts, out);
  }
  if (info->compression == 0x5061) {  // Panasonic RW2 v4 bitstream
    if (info->n_strips < 1 || strip_offsets[0] >= len) return 2;
    size_t avail = strip_counts[0] ? strip_counts[0] : len - strip_offsets[0];
    if (strip_offsets[0] + avail > len) avail = len - strip_offsets[0];
    return pana_v4_decode(buf + strip_offsets[0], avail, info, out);
  }
  if (info->compression == 1 && info->container == 6 && info->bits == 12 &&
      info->n_strips >= 1 && strip_counts[0] &&
      strip_counts[0] < ((uint64_t)W * H * 12) / 8) {
    // ORF strip smaller than the packed-12 size -> Olympus codec
    // (the rawspeed OrfDecoder size rule; the Compression tag lies)
    if (strip_offsets[0] >= len) return 2;
    size_t avail = strip_counts[0];
    if (strip_offsets[0] + avail > len) avail = len - strip_offsets[0];
    return olympus_decode(buf + strip_offsets[0], avail, info, out);
  }
  if (info->compression == 1) {
    // packed big/little-endian 10/12/14/16-bit, strip by strip
    size_t row = 0;
    for (uint32_t s = 0; s < info->n_strips && row < H; s++) {
      const uint8_t *p = buf + strip_offsets[s];
      size_t avail = strip_counts[s];
      if (strip_offsets[s] + avail > len) return 2;
      size_t rows = rows_per_strip ? rows_per_strip : H;
      if (row + rows > H) rows = H - row;
      if (info->bits == 16) {
        bool le = info->endian_le != 0;
        if (avail < rows * W * 2) return 3;
        for (size_t i = 0; i < rows * W; i++)
          out[row * W + i] =
              le ? (uint16_t)(p[2 * i] | p[2 * i + 1] << 8)
                 : (uint16_t)(p[2 * i] << 8 | p[2 * i + 1]);
      } else if (info->container == 2 || info->container == 6) {
        // Fuji / Olympus packed: little-endian, LSB-first bit order
        uint64_t acc = 0;
        int nb = 0;
        size_t pi = 0;
        for (size_t i = 0; i < rows * W; i++) {
          while (nb < (int)info->bits) {
            if (pi >= avail) return 3;
            acc |= (uint64_t)p[pi++] << nb;
            nb += 8;
          }
          out[row * W + i] = (uint16_t)(acc & ((1u << info->bits) - 1));
          acc >>= info->bits;
          nb -= info->bits;
        }
      } else {
        // MSB-first packed bitstream (TIFF FillOrder 1)
        uint64_t acc = 0;
        int nb = 0;
        size_t pi = 0;
        for (size_t i = 0; i < rows * W; i++) {
          while (nb < (int)info->bits) {
            if (pi >= avail) return 3;
            acc = (acc << 8) | p[pi++];
            nb += 8;
          }
          out[row * W + i] =
              (uint16_t)((acc >> (nb - info->bits)) & ((1u << info->bits) - 1));
          nb -= info->bits;
        }
      }
      row += rows;
    }
    return 0;
  }
  if (info->compression == 6) {
    // CR2 lossless JPEG, one stream covering the whole sensor, optionally
    // cut into Canon vertical slices (tag 0xC640: count, wa, w_last).
    // De-slicing per dcraw/rawspeed: flat decoded index -> (slice, row,
    // col-within-slice).
    std::vector<uint16_t> tmp((size_t)W * H + 16);
    int w = 0, h = 0, comps = 0;
    int rc = lj92_decode(buf + strip_offsets[0], strip_counts[0], tmp.data(),
                         tmp.size(), &w, &h, &comps);
    if (rc) return 100 + rc;
    const size_t total = (size_t)w * h * comps;
    if (total != (size_t)W * H) return 4;
    uint32_t cnt = info->cr2_slices[0];
    uint32_t wa = info->cr2_slices[1], wb = info->cr2_slices[2];
    if (cnt == 0 || (size_t)(cnt * wa + wb) != W) {
      memcpy(out, tmp.data(), total * 2);
      return 0;
    }
    for (size_t i = 0; i < total; i++) {
      size_t j = i / ((size_t)wa * H);
      size_t ws = (j < cnt) ? wa : wb;
      size_t x0 = (j < cnt) ? j * wa : cnt * wa;
      size_t rem = i - ((j < cnt) ? j * (size_t)wa * H
                                  : (size_t)cnt * wa * H);
      size_t rr = rem / ws, cc = rem % ws;
      if (rr < H && x0 + cc < W) out[rr * W + x0 + cc] = tmp[i];
    }
    return 0;
  }
  if (info->compression == 34713) {  // Nikon NEF entropy coding
    if (info->n_strips < 1) return 30;
    if (strip_offsets[0] >= len) return 2;
    size_t avail = strip_counts[0] ? strip_counts[0] : len - strip_offsets[0];
    if (strip_offsets[0] + avail > len) avail = len - strip_offsets[0];
    double white = info->white;
    int rc = nikon_34713_decode(buf, len, info, buf + strip_offsets[0],
                                avail, out, &white);
    if (rc == 0 && white > 0) info->white = white;
    return rc;
  }
  if (info->compression == 0x4352) {  // Canon CR3 (CRX raw track)
    if (info->n_strips < 1 || strip_offsets[0] >= len) return 2;
    size_t avail = strip_counts[0] ? strip_counts[0] : len - strip_offsets[0];
    if (strip_offsets[0] + avail > len) avail = len - strip_offsets[0];
    return crx_decode(buf + strip_offsets[0], avail, info, out);
  }
  if (info->compression == 0x4653) {  // Fuji lossless-compressed RAF
    if (info->n_strips < 1 || strip_offsets[0] >= len) return 2;
    size_t avail = strip_counts[0] ? strip_counts[0] : len - strip_offsets[0];
    if (strip_offsets[0] + avail > len) avail = len - strip_offsets[0];
    return fuji_compressed_decode(buf + strip_offsets[0], avail, info, out);
  }
  if (info->compression == 32767) {  // Sony ARW2
    if (info->n_strips < 1) return 31;
    if (strip_offsets[0] >= len) return 2;
    size_t avail = strip_counts[0] ? strip_counts[0] : len - strip_offsets[0];
    if (strip_offsets[0] + avail > len) avail = len - strip_offsets[0];
    double white = info->white;
    int rc = sony_arw2_decode(info, buf + strip_offsets[0], avail, out,
                              &white);
    if (rc == 0 && white > 0) info->white = white;
    return rc;
  }
  if (info->compression == 7) {  // lossless JPEG strips
    std::vector<uint16_t> tmp((size_t)W * H * 2);
    size_t row = 0;
    for (uint32_t s = 0; s < info->n_strips && row < H; s++) {
      if (strip_offsets[s] + strip_counts[s] > len) return 2;
      int w = 0, h = 0, comps = 0;
      int rc = lj92_decode(buf + strip_offsets[s], strip_counts[s],
                           tmp.data(), tmp.size(), &w, &h, &comps);
      if (rc) return 100 + rc;
      // LJ92 in DNG packs 2 mosaic columns per "component" commonly;
      // w * comps must equal the mosaic strip width
      if ((size_t)w * comps != W) return 4;
      size_t rows = (size_t)h;
      if (row + rows > H) rows = H - row;
      for (size_t y = 0; y < rows; y++)
        memcpy(out + (row + y) * W, tmp.data() + y * W, W * 2);
      row += rows;
    }
    return 0;
  }
  return 1;  // unsupported compression
}

}  // extern "C"
