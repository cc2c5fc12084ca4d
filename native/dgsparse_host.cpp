// dgsparse_tpu native host library.
//
// TPU-native replacement for the reference's native host-side machinery:
// - edge-tile planner (the plan-time analog of the reference's runtime
//   load-balancing kernel selection, src/cuda/spmm_cuda.cu:36-165, and of
//   the spconv qkpos 128-quantized scan,
//   include/cuda/sparse_mapping.cuh:272-290),
// - CSR -> CSC transpose (reference wraps cusparseCsr2cscEx2,
//   include/cuda/csr2csc.cuh:8-26; here a counting-sort transpose),
// - spconv rulebook builder (reference uses a GPU open-addressing hash
//   table, include/cuda/sparse_mapping.cuh:26-58; here a CPU open-addressing
//   hash over packed voxel keys).
//
// All entry points are extern "C" and operate on caller-allocated buffers so
// they bind through ctypes with zero copies. Sparsity structure is host-
// static in the TPU design, so this code runs once per graph/point-cloud,
// off the device critical path — but it must still be fast for
// million-edge graphs, hence C++ instead of numpy.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// CSR -> CSC counting-sort transpose. All index arrays int32.
// colptr: [ncol+1], row_out/perm_out: [nnz].
// ---------------------------------------------------------------------------
void dg_csr2csc(const int32_t* rowptr, const int32_t* col, int32_t nrow,
                int32_t ncol, int64_t nnz, int32_t* colptr, int32_t* row_out,
                int32_t* perm_out) {
  std::memset(colptr, 0, sizeof(int32_t) * (ncol + 1));
  for (int64_t e = 0; e < nnz; ++e) colptr[col[e] + 1]++;
  for (int32_t c = 0; c < ncol; ++c) colptr[c + 1] += colptr[c];
  std::vector<int32_t> cursor(colptr, colptr + ncol);
  for (int32_t r = 0; r < nrow; ++r) {
    for (int32_t e = rowptr[r]; e < rowptr[r + 1]; ++e) {
      int32_t pos = cursor[col[e]]++;
      row_out[pos] = r;
      perm_out[pos] = e;
    }
  }
}

// ---------------------------------------------------------------------------
// Edge-tile planner (see dgsparse_tpu/core/planner.py for the layout spec).
// Pass 1: dg_plan_count returns the number of tiles so the caller can
// allocate. Pass 2: dg_plan_fill writes cols/eperm/lrow/tile_rb.
// ---------------------------------------------------------------------------
int64_t dg_plan_count(const int32_t* rowptr, int32_t nrow, int32_t edge_tile,
                      int32_t row_block) {
  int32_t num_rb = std::max((nrow + row_block - 1) / row_block, 1);
  int64_t tiles = 0;
  for (int32_t rb = 0; rb < num_rb; ++rb) {
    int32_t lo_row = std::min(rb * row_block, nrow);
    int32_t hi_row = std::min((rb + 1) * row_block, nrow);
    int64_t e = rowptr[hi_row] - rowptr[lo_row];
    tiles += std::max((e + edge_tile - 1) / edge_tile, (int64_t)1);
  }
  return tiles;
}

void dg_plan_fill(const int32_t* rowptr, const int32_t* col, int32_t nrow,
                  int32_t edge_tile, int32_t row_block, int32_t sort_cols,
                  int32_t* cols, int32_t* eperm, int32_t* lrow,
                  int32_t* tile_rb) {
  int32_t num_rb = std::max((nrow + row_block - 1) / row_block, 1);
  int64_t slot = 0, tile = 0;
  std::vector<std::pair<int32_t, int32_t>> buf;  // (col, csr position)
  for (int32_t rb = 0; rb < num_rb; ++rb) {
    int32_t lo_row = std::min(rb * row_block, nrow);
    int32_t hi_row = std::min((rb + 1) * row_block, nrow);
    int64_t lo = rowptr[lo_row], hi = rowptr[hi_row];
    int64_t e = hi - lo;
    int64_t n_tiles = std::max((e + edge_tile - 1) / edge_tile, (int64_t)1);
    int64_t padded = n_tiles * edge_tile;

    buf.clear();
    buf.reserve(e);
    for (int32_t r = lo_row; r < hi_row; ++r)
      for (int32_t p = rowptr[r]; p < rowptr[r + 1]; ++p)
        buf.emplace_back(col[p], p);
    if (sort_cols)
      std::stable_sort(buf.begin(), buf.end(),
                       [](auto& a, auto& b) { return a.first < b.first; });

    // local row for each csr position: recover row by walking rowptr
    // (positions are CSR-ordered per row; store row per position).
    std::vector<int32_t> pos_row(e);
    {
      int64_t i = 0;
      for (int32_t r = lo_row; r < hi_row; ++r)
        for (int32_t p = rowptr[r]; p < rowptr[r + 1]; ++p)
          pos_row[i++] = r - lo_row;
    }

    for (int64_t i = 0; i < padded; ++i) {
      if (i < e) {
        cols[slot] = buf[i].first;
        eperm[slot] = buf[i].second;
        lrow[slot] = pos_row[buf[i].second - lo];
      } else {
        cols[slot] = 0;
        eperm[slot] = -1;
        // out-of-range local row: inert for one-hot sum, own segment for
        // the max/min segmented scan
        lrow[slot] = row_block;
      }
      ++slot;
    }
    for (int64_t t = 0; t < n_tiles; ++t) tile_rb[tile++] = rb;
  }
}

// ---------------------------------------------------------------------------
// spconv rulebook builder.
//
// Open-addressing hash table over packed (b,x,y,z) voxel keys (the CPU
// analog of the reference's insertHash/insertVal + linear probing,
// include/cuda/sparse_mapping.cuh:26-58).
// ---------------------------------------------------------------------------
namespace {

struct VoxelHash {
  std::vector<int64_t> keys;
  std::vector<int32_t> vals;
  int64_t mask;
  int64_t count = 0;

  explicit VoxelHash(int64_t n) {
    int64_t cap = 4;
    while (cap < n * 2) cap <<= 1;
    keys.assign(cap, -1);
    vals.assign(cap, -1);
    mask = cap - 1;
  }
  void grow() {
    std::vector<int64_t> ok;
    std::vector<int32_t> ov;
    ok.swap(keys);
    ov.swap(vals);
    int64_t cap = (mask + 1) << 1;
    keys.assign(cap, -1);
    vals.assign(cap, -1);
    mask = cap - 1;
    for (size_t i = 0; i < ok.size(); ++i)
      if (ok[i] != -1) {
        uint64_t h = mix((uint64_t)ok[i]) & mask;
        while (keys[h] != -1) h = (h + 1) & mask;
        keys[h] = ok[i];
        vals[h] = ov[i];
      }
  }
  static uint64_t mix(uint64_t k) {
    k ^= k >> 33;
    k *= 0xff51afd7ed558ccdULL;
    k ^= k >> 33;
    k *= 0xc4ceb9fe1a85ec53ULL;
    k ^= k >> 33;
    return k;
  }
  void insert(int64_t key, int32_t val) {
    uint64_t h = mix((uint64_t)key) & mask;
    while (keys[h] != -1 && keys[h] != key) h = (h + 1) & mask;
    if (keys[h] == -1 && ++count * 3 > (mask + 1) * 2) {
      keys[h] = key;
      vals[h] = val;
      grow();
      return;
    }
    keys[h] = key;
    vals[h] = val;
  }
  int32_t find(int64_t key) const {
    uint64_t h = mix((uint64_t)key) & mask;
    while (keys[h] != -1) {
      if (keys[h] == key) return vals[h];
      h = (h + 1) & mask;
    }
    return -1;
  }
};

inline int64_t pack(int32_t b, int32_t x, int32_t y, int32_t z,
                    const int64_t* dims) {
  return (((int64_t)b * dims[0] + x) * dims[1] + y) * dims[2] + z;
}

}  // namespace

// Submanifold rulebook: out coords == in coords. For each kernel offset
// (except the center when separate_mid) and each output voxel, probe the
// input voxel at out - center + offset. Writes pair counts per offset to
// knnz; imap/omap must have room for n_coords per offset (worst case).
// Returns total number of pairs.
int64_t dg_rulebook_subm(const int32_t* coords, int64_t n, int32_t k0,
                         int32_t k1, int32_t k2, const int32_t* spatial,
                         int32_t separate_mid, int32_t* imap, int32_t* omap,
                         int64_t* knnz) {
  int64_t dims[3] = {spatial[0] + k0 + 2, spatial[1] + k1 + 2,
                     spatial[2] + k2 + 2};
  VoxelHash table(n);
  for (int64_t i = 0; i < n; ++i)
    table.insert(pack(coords[i * 4], coords[i * 4 + 1] + k0,
                      coords[i * 4 + 2] + k1, coords[i * 4 + 3] + k2, dims),
                 (int32_t)i);
  int32_t k_vol = k0 * k1 * k2;
  int32_t mid = (k_vol - 1) / 2;
  int64_t total = 0;
  for (int32_t kp = 0; kp < k_vol; ++kp) {
    int64_t cnt = 0;
    if (!(separate_mid && kp == mid)) {
      int32_t dz = kp % k2, dy = (kp / k2) % k1, dx = kp / (k1 * k2);
      int32_t ox = dx - k0 / 2, oy = dy - k1 / 2, oz = dz - k2 / 2;
      int32_t* im = imap + kp * n;
      int32_t* om = omap + kp * n;
      for (int64_t i = 0; i < n; ++i) {
        int32_t v = table.find(pack(
            coords[i * 4], coords[i * 4 + 1] + ox + k0,
            coords[i * 4 + 2] + oy + k1, coords[i * 4 + 3] + oz + k2, dims));
        if (v >= 0) {
          im[cnt] = v;
          om[cnt] = (int32_t)i;
          ++cnt;
        }
      }
    }
    knnz[kp] = cnt;
    total += cnt;
  }
  return total;
}

// Strided rulebook (downsampling conv). Generates the unique output coords
// (the reference's expand + sort + unique, src/cuda/sparse_mapping.cu:94-129)
// and per-offset (input, output) pairs in one pass over a voxel hash.
// Buffers: out_coords [n*k_vol*4] worst case; imap/omap blocks of n per
// offset (for a fixed offset each input voxel yields at most one pair).
// Returns the number of unique output coords.
int64_t dg_rulebook_strided(const int32_t* coords, int64_t n, int32_t k0,
                            int32_t k1, int32_t k2, int32_t s0, int32_t s1,
                            int32_t s2, int32_t p0, int32_t p1, int32_t p2,
                            const int32_t* spatial, int32_t* out_coords,
                            int32_t* imap, int32_t* omap, int64_t* knnz) {
  int64_t dims[3] = {spatial[0] + k0 + 2, spatial[1] + k1 + 2,
                     spatial[2] + k2 + 2};
  int32_t out_sp[3] = {(spatial[0] + 2 * p0 - k0) / s0 + 1,
                       (spatial[1] + 2 * p1 - k1) / s1 + 1,
                       (spatial[2] + 2 * p2 - k2) / s2 + 1};
  int64_t odims[3] = {out_sp[0] + 2, out_sp[1] + 2, out_sp[2] + 2};

  VoxelHash in_table(n);
  for (int64_t i = 0; i < n; ++i)
    in_table.insert(pack(coords[i * 4], coords[i * 4 + 1],
                         coords[i * 4 + 2], coords[i * 4 + 3], dims),
                    (int32_t)i);

  int32_t k_vol = k0 * k1 * k2;
  // unique output coords via a dedupe hash (worst case n * k_vol entries)
  VoxelHash out_table(n);  // grows on demand
  std::vector<std::pair<int64_t, int64_t>> uniq;  // (key, idx into ocand)
  std::vector<int32_t> ocand;                     // 4 ints per unique coord
  uniq.reserve(n * 2);
  ocand.reserve(n * 8);
  for (int64_t i = 0; i < n; ++i) {
    int32_t b = coords[i * 4];
    int32_t xyz[3] = {coords[i * 4 + 1], coords[i * 4 + 2],
                      coords[i * 4 + 3]};
    for (int32_t dx = 0; dx < k0; ++dx)
      for (int32_t dy = 0; dy < k1; ++dy)
        for (int32_t dz = 0; dz < k2; ++dz) {
          int32_t v0 = xyz[0] + p0 - dx, v1 = xyz[1] + p1 - dy,
                  v2 = xyz[2] + p2 - dz;
          if (v0 < 0 || v1 < 0 || v2 < 0) continue;
          if (v0 % s0 || v1 % s1 || v2 % s2) continue;
          int32_t o0 = v0 / s0, o1 = v1 / s1, o2 = v2 / s2;
          if (o0 >= out_sp[0] || o1 >= out_sp[1] || o2 >= out_sp[2])
            continue;
          int64_t key = pack(b, o0, o1, o2, odims);
          if (out_table.find(key) < 0) {
            out_table.insert(key, 1);
            uniq.emplace_back(key, (int64_t)(ocand.size() / 4));
            ocand.push_back(b);
            ocand.push_back(o0);
            ocand.push_back(o1);
            ocand.push_back(o2);
          }
        }
  }
  std::sort(uniq.begin(), uniq.end());
  int64_t num_out = (int64_t)uniq.size();
  for (int64_t o = 0; o < num_out; ++o) {
    int64_t src = uniq[o].second * 4;
    for (int i = 0; i < 4; ++i) out_coords[o * 4 + i] = ocand[src + i];
  }

  for (int32_t kp = 0; kp < k_vol; ++kp) {
    int32_t dz = kp % k2, dy = (kp / k2) % k1, dx = kp / (k1 * k2);
    int32_t* im = imap + (int64_t)kp * n;
    int32_t* om = omap + (int64_t)kp * n;
    int64_t cnt = 0;
    for (int64_t o = 0; o < num_out; ++o) {
      int32_t i0 = out_coords[o * 4 + 1] * s0 - p0 + dx;
      int32_t i1 = out_coords[o * 4 + 2] * s1 - p1 + dy;
      int32_t i2 = out_coords[o * 4 + 3] * s2 - p2 + dz;
      if (i0 < 0 || i1 < 0 || i2 < 0 || i0 >= spatial[0] ||
          i1 >= spatial[1] || i2 >= spatial[2])
        continue;
      int32_t v = in_table.find(pack(out_coords[o * 4], i0, i1, i2, dims));
      if (v >= 0) {
        im[cnt] = v;
        om[cnt] = (int32_t)o;
        ++cnt;
      }
    }
    knnz[kp] = cnt;
  }
  return num_out;
}

// ---------------------------------------------------------------------------
// Hybrid cell-split planner (core/planner.py build_hybrid_plan's hot path).
//
// Classifies every (row_block x col_window) cell of the CSR structure by
// edge count into three tiers (materialized-dense / one-hot BELL /
// bucketed-ELL residue) and emits, for the dense tier, the slot-sorted
// edge layout the device-side segment-sum materialization consumes. The
// numpy twin costs two 100M+-element argsorts at Reddit scale; this is
// counting sorts end-to-end, O(nnz + cells).
// ---------------------------------------------------------------------------
namespace {

struct CellSplit {
  int32_t nrb, ncw;
  std::vector<int32_t> counts;   // per cell
  std::vector<uint8_t> tier;     // 0=residue, 1=bell, 2=dense
  std::vector<int64_t> sel;      // selected dense cell ids, ascending
  int64_t n_dense = 0, n_bell = 0, n_res = 0;
};

void cell_classify(const int32_t* rowptr, const int32_t* col, int32_t m,
                   int32_t n, int32_t R, int32_t C, int32_t min_cell,
                   int32_t dense_min, int32_t max_cells, CellSplit* cs) {
  cs->nrb = std::max((m + R - 1) / R, 1);
  cs->ncw = std::max((n + C - 1) / C, 1);
  int64_t ncells = (int64_t)cs->nrb * cs->ncw;
  cs->counts.assign(ncells, 0);
  for (int32_t r = 0; r < m; ++r) {
    int64_t base = (int64_t)(r / R) * cs->ncw;
    for (int32_t e = rowptr[r]; e < rowptr[r + 1]; ++e)
      cs->counts[base + col[e] / C]++;
  }
  cs->tier.assign(ncells, 0);
  std::vector<int32_t> cand_counts;
  for (int64_t c = 0; c < ncells; ++c) {
    if (cs->counts[c] >= dense_min) {
      cs->tier[c] = 2;
      cand_counts.push_back(cs->counts[c]);
    } else if (cs->counts[c] >= min_cell) {
      cs->tier[c] = 1;
    }
  }
  if ((int64_t)cand_counts.size() > max_cells) {
    // threshold rule: keep counts > kth largest, then == kth in ascending
    // cell-id order until max_cells (deterministic, matches the Python
    // twin's rule)
    std::nth_element(cand_counts.begin(), cand_counts.begin() + max_cells - 1,
                     cand_counts.end(), std::greater<int32_t>());
    int32_t kth = cand_counts[max_cells - 1];
    int64_t above = 0;
    for (int64_t c = 0; c < ncells; ++c)
      if (cs->tier[c] == 2 && cs->counts[c] > kth) ++above;
    int64_t quota = max_cells - above;
    for (int64_t c = 0; c < ncells; ++c) {
      if (cs->tier[c] != 2) continue;
      if (cs->counts[c] > kth) continue;
      if (cs->counts[c] == kth && quota > 0) {
        --quota;
        continue;
      }
      cs->tier[c] = 1;  // demote to bell tier
    }
  }
  for (int64_t c = 0; c < ncells; ++c) {
    if (cs->tier[c] == 2) {
      cs->sel.push_back(c);
      cs->n_dense += cs->counts[c];
    } else if (cs->tier[c] == 1) {
      cs->n_bell += cs->counts[c];
    } else {
      cs->n_res += cs->counts[c];
    }
  }
}

}  // namespace

// Pass 1: sizes. out5 = {n_dense_edges, n_bell_edges, n_res_edges,
// n_sel_cells, nrb*ncw (diagnostic)}.
void dg_cell_split_count(const int32_t* rowptr, const int32_t* col,
                         int32_t m, int32_t n, int32_t R, int32_t C,
                         int32_t min_cell, int32_t dense_min,
                         int32_t max_cells, int64_t* out5) {
  CellSplit cs;
  cell_classify(rowptr, col, m, n, R, C, min_cell, dense_min, max_cells,
                &cs);
  out5[0] = cs.n_dense;
  out5[1] = cs.n_bell;
  out5[2] = cs.n_res;
  out5[3] = (int64_t)cs.sel.size();
  out5[4] = (int64_t)cs.nrb * cs.ncw;
}

// Pass 2: fill. d_slot/d_eperm: [n_dense] (slot-sorted, CSR-stable);
// cell_rb/cell_cw: [n_sel]; bell_ids: [n_bell], res_ids: [n_res] (both in
// CSR edge order).
void dg_cell_split_fill(const int32_t* rowptr, const int32_t* col,
                        int32_t m, int32_t n, int32_t R, int32_t C,
                        int32_t min_cell, int32_t dense_min,
                        int32_t max_cells, int32_t* d_slot,
                        int32_t* d_eperm, int32_t* cell_rb, int32_t* cell_cw,
                        int32_t* bell_ids, int32_t* res_ids) {
  CellSplit cs;
  cell_classify(rowptr, col, m, n, R, C, min_cell, dense_min, max_cells,
                &cs);
  int64_t nsel = (int64_t)cs.sel.size();
  // cell id -> dense index (ascending id = (rb, cw) lexicographic)
  std::vector<int32_t> cidx((int64_t)cs.nrb * cs.ncw, -1);
  std::vector<int64_t> group_off(nsel + 1, 0);
  for (int64_t i = 0; i < nsel; ++i) {
    cidx[cs.sel[i]] = (int32_t)i;
    cell_rb[i] = (int32_t)(cs.sel[i] / cs.ncw);
    cell_cw[i] = (int32_t)(cs.sel[i] % cs.ncw);
    group_off[i + 1] = group_off[i] + cs.counts[cs.sel[i]];
  }
  // Block-row-local two-sweep counting sort. The first version grouped
  // all dense edges globally (random 366 MB scatter) and recovered rows
  // through a full [nnz] erow table (two more random O(nnz) streams) —
  // 77 s at 115M edges. Processing one 128-row block at a time keeps
  // every histogram and the tier slice cache-resident: measured seconds.
  int64_t bc = 0, rc = 0;
  const int64_t slots = (int64_t)R * C;
  std::vector<int32_t> hist;          // [nloc * R*C] per block row
  std::vector<int32_t> loc_cells;     // selected cells of this block row
  for (int32_t rb = 0; rb < cs.nrb; ++rb) {
    const int32_t r0 = rb * R;
    const int32_t r1 = std::min(m, r0 + R);
    const int64_t cbase = (int64_t)rb * cs.ncw;
    loc_cells.clear();
    for (int32_t cw = 0; cw < cs.ncw; ++cw)
      if (cs.tier[cbase + cw] == 2) loc_cells.push_back(cw);
    const int64_t nloc = (int64_t)loc_cells.size();
    // local cw -> histogram index (dense map over this block row only)
    std::vector<int32_t> lmap(cs.ncw, -1);
    for (int64_t i = 0; i < nloc; ++i) lmap[loc_cells[i]] = (int32_t)i;
    if (nloc) {
      hist.assign(nloc * slots, 0);
      for (int32_t r = r0; r < r1; ++r) {
        const int32_t lr = r - r0;
        for (int32_t e = rowptr[r]; e < rowptr[r + 1]; ++e) {
          const int32_t cw = col[e] / C;
          const int32_t li = lmap[cw];
          if (li >= 0) hist[(int64_t)li * slots + lr * C + col[e] % C]++;
        }
      }
      // exclusive prefix per local cell -> global write cursors
      for (int64_t i = 0; i < nloc; ++i) {
        const int64_t gi = cidx[cbase + loc_cells[i]];
        int64_t acc = group_off[gi];
        int32_t* h = hist.data() + i * slots;
        for (int64_t s = 0; s < slots; ++s) {
          const int32_t c0 = h[s];
          h[s] = (int32_t)(acc - group_off[gi]);  // offset within group
          acc += c0;
        }
      }
    }
    for (int32_t r = r0; r < r1; ++r) {
      const int32_t lr = r - r0;
      for (int32_t e = rowptr[r]; e < rowptr[r + 1]; ++e) {
        const int32_t cw = col[e] / C;
        switch (cs.tier[cbase + cw]) {
          case 2: {
            const int64_t li = lmap[cw];
            const int64_t gi = cidx[cbase + cw];
            const int32_t s = lr * C + col[e] % C;
            const int64_t pos = group_off[gi] + hist[li * slots + s]++;
            d_slot[pos] = (int32_t)(gi * slots + s);
            d_eperm[pos] = e;
            break;
          }
          case 1:
            bell_ids[bc++] = e;
            break;
          default:
            res_ids[rc++] = e;
        }
      }
    }
  }
}

int32_t dg_version() { return 11; }

}  // extern "C"
