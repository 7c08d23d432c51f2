// Decode-plan builder: LZ77 sequences -> scheduled slope-1 fragment passes.
//
// The TPU-native decode design splits decompression into a host PLAN stage
// and a device EXECUTE stage.  The plan turns a block's sequences into
// "fragments" — disjoint output spans, each a slope-1 copy
//
//   out[p] = src_plane[p + shift]     for p in [dst, dst+len)
//
// where src_plane is either the compressed stream (literals, and matches
// that resolve there cleanly) or the partially-built output (deep match
// chains).  Fragments are then greedily scheduled into PASSES: each pass
// supplies at most one fragment per 128-byte output row, all sources of a
// fragment are materialized in strictly earlier passes, and every pass
// reads from a single source plane (comp-source passes first, then
// out-source passes).  The device kernel executes one pass with pure
// vector work — an MXU one-hot row gather plus a per-lane shuffle — so
// total decode cost is (number of passes) x (a few microseconds),
// independent of sequence count.
//
// Key choices:
// * Matches whose source projects onto <= kSplitLimit comp-space pieces are
//   resolved immediately (collapses the common shallow chains of real
//   text); deeper or splintered chains stay out-space references.
// * Overlapping matches (offset < length, the RLE case) are split into
//   log2(len/offset) doubling pieces, each a plain slope-1 out-space copy.
// * A block whose schedule exceeds the caller's pass budget is reported
//   unplannable; the engine falls back to the scalar-walk kernel.

#include "bitar_host.h"

#include <algorithm>
#include <cstring>
#include <vector>

namespace {

thread_local int g_split_limit = 2;  // per-thread: see bt_plan_rows' split_limit arg

struct Frag {
  int32_t dst;
  int32_t len;
  int32_t shift;      // src = p + shift in the source plane
  uint8_t out_space;  // 0 = comp plane, 1 = output plane
  int32_t cell_base;  // index of this fragment's first row-cell pass
};

class Planner {
 public:
  // Fragment covering output pos (fragments are dense, dst-ordered).
  int FindIdx(int32_t pos) const {
    size_t lo = 0, hi = frags_.size();
    while (lo < hi) {
      const size_t mid = (lo + hi) / 2;
      if (frags_[mid].dst + frags_[mid].len <= pos) lo = mid + 1;
      else hi = mid;
    }
    if (lo >= frags_.size() || frags_[lo].dst > pos) return -1;
    return static_cast<int>(lo);
  }

  void Append(int32_t dst, int32_t len, int32_t shift, bool out_space) {
    if (len <= 0) return;
    if (!frags_.empty()) {
      Frag& b = frags_.back();
      // Merge contiguous continuations of the same copy — but an
      // out-space fragment must never grow to overlap its own source
      // (len <= offset, offset = -shift), or a single pass would read
      // bytes it writes.
      if (b.dst + b.len == dst && b.shift == shift &&
          b.out_space == (out_space ? 1 : 0) &&
          (!out_space || b.len + len <= -shift)) {
        b.len += len;
        return;
      }
    }
    frags_.push_back({dst, len, shift, static_cast<uint8_t>(out_space), 0});
  }

  struct Piece { int32_t comp_src; int32_t len; };

  // Projects an output range onto comp-space pieces, following out-space
  // fragments transitively (collapses match-of-match chains).  Fails when
  // the projection splinters past the piece limit or recurses too deep
  // (pathological chains stay out-space instead).
  bool ProjectToComp(int32_t pos, int32_t len, std::vector<Piece>* pieces,
                     int depth) const {
    if (depth > 64) return false;
    while (len > 0) {
      const int fi = FindIdx(pos);
      if (fi < 0) return false;
      const Frag& f = frags_[fi];
      const int32_t take = std::min(len, f.dst + f.len - pos);
      if (f.out_space) {
        if (!ProjectToComp(pos + f.shift, take, pieces, depth + 1)) {
          return false;
        }
      } else {
        const int32_t src = pos + f.shift;
        if (!pieces->empty() &&
            pieces->back().comp_src + pieces->back().len == src) {
          pieces->back().len += take;
        } else {
          if (static_cast<int>(pieces->size()) >= g_split_limit) return false;
          pieces->push_back({src, take});
        }
      }
      pos += take;
      len -= take;
    }
    return true;
  }

  // Emit fragments for a match piece [d, d+len) copying from out-space
  // [d-off, d-off+len) (no self-overlap: off >= len guaranteed by caller).
  // Resolves to comp-space when the transitive projection stays small,
  // else emits one out-space fragment.
  bool EmitMatch(int32_t d, int32_t len, int32_t off) {
    static thread_local std::vector<Piece> pieces;
    pieces.clear();
    if (ProjectToComp(d - off, len, &pieces, 0)) {
      int32_t e = d;
      for (const Piece& p : pieces) {
        Append(e, p.len, p.comp_src - e, /*out_space=*/false);
        e += p.len;
      }
      return true;
    }
    if (FindIdx(d - off) < 0) return false;  // malformed source range
    Append(d, len, -off, /*out_space=*/true);
    return true;
  }

  bool Build(int nseq, const int32_t* lit_ptr, const int32_t* lit_len,
             const int32_t* off, const int32_t* mlen, const int32_t* out_pos,
             int max_frags) {
    for (int s = 0; s < nseq; ++s) {
      if (static_cast<int>(frags_.size()) > max_frags) return false;
      Append(out_pos[s], lit_len[s], lit_ptr[s] - out_pos[s], false);
      const int32_t m = mlen[s];
      if (m <= 0) continue;
      const int32_t d = out_pos[s] + lit_len[s];
      const int32_t o = off[s];
      if (o >= m) {
        if (!EmitMatch(d, m, o)) return false;
        continue;
      }
      // Overlap: doubling pieces [d, d+o), [d+o, d+2o), [d+2o, d+4o) ...
      int32_t defined = 0;
      while (defined < m) {
        const int32_t chunk = std::min(defined == 0 ? o : defined, m - defined);
        // Source of this piece is [d - o + defined, ...): distance back is
        // o + (0) .. constant o relative to its own start?  Piece start
        // e = d + defined copies from e - step where step = o when
        // defined == 0 else `defined` is fine too; use distance that
        // guarantees the source is fully materialized: copy from
        // [d - o, d - o + chunk) shifted: e - (o + defined - defined)...
        // Simplest correct choice: piece copies from o bytes back when
        // defined == 0, else from `defined` bytes back (doubling).
        const int32_t step = (defined == 0) ? o : defined;
        if (!EmitMatch(d + defined, chunk, step)) return false;
        defined += chunk;
      }
    }
    return true;
  }

  // Greedy pass scheduling at ROW-CELL granularity: every (fragment, row)
  // pair is scheduled independently, so a fragment spanning many rows does
  // not force one global pass (which would cascade into a pass-count
  // "staircase" along the block).  Invariants per cell:
  //   * at most one cell per (row, pass),
  //   * comp-source cells take passes [0, p0), out-source cells [p0, P),
  //   * an out-source cell's pass strictly exceeds the passes of all cells
  //     covering its source byte range.
  // Returns total passes, or -1 when over budget.
  int Schedule(int nrows, int max_passes, int* p0_out) {
    // Allocate cell pass storage.
    size_t total_cells = 0;
    for (Frag& f : frags_) {
      f.cell_base = static_cast<int32_t>(total_cells);
      total_cells += (f.dst + f.len - 1) / 128 - f.dst / 128 + 1;
    }
    cell_pass_.assign(total_cells, 0);

    std::vector<int> comp_slots(nrows, 0);
    int p0 = 0;
    for (const Frag& f : frags_) {
      if (f.out_space) continue;
      const int r0 = f.dst / 128;
      const int r1 = (f.dst + f.len - 1) / 128;
      for (int r = r0; r <= r1; ++r) {
        const int pass = comp_slots[r]++;
        cell_pass_[f.cell_base + (r - r0)] = pass;
        p0 = std::max(p0, pass + 1);
      }
    }
    if (p0 > max_passes) return -1;

    // Out-source cells: dependency floors leave holes in a row's pass
    // sequence; reuse them (first-fit above the floor) instead of only
    // appending, which keeps P near the true per-row density.
    std::vector<uint8_t> used(static_cast<size_t>(nrows) * max_passes, 0);
    int total = p0;
    for (const Frag& f : frags_) {
      if (!f.out_space) continue;
      const int r0 = f.dst / 128;
      const int r1 = (f.dst + f.len - 1) / 128;
      for (int r = r0; r <= r1; ++r) {
        const int32_t cell_lo = std::max(f.dst, r * 128);
        const int32_t cell_hi = std::min(f.dst + f.len, (r + 1) * 128);
        // Dependency floor over the source range of this cell.
        int floor_pass = p0 - 1;
        int32_t pos = cell_lo + f.shift;
        int32_t remaining = cell_hi - cell_lo;
        while (remaining > 0) {
          const int fi = FindIdx(pos);
          if (fi < 0) return -1;
          const Frag& s = frags_[fi];
          const int32_t take = std::min(remaining, s.dst + s.len - pos);
          const int sr0 = s.dst / 128;
          for (int sr = pos / 128; sr <= (pos + take - 1) / 128; ++sr) {
            floor_pass = std::max(
                floor_pass, cell_pass_[s.cell_base + (sr - sr0)]);
          }
          pos += take;
          remaining -= take;
        }
        int pass = std::max(floor_pass + 1, p0);
        uint8_t* row_used = used.data() + static_cast<size_t>(r) * max_passes;
        while (pass < max_passes && row_used[pass]) ++pass;
        if (pass >= max_passes) return -1;
        row_used[pass] = 1;
        cell_pass_[f.cell_base + (r - r0)] = pass;
        total = std::max(total, pass + 1);
      }
    }
    *p0_out = p0;
    return total;
  }

  std::vector<Frag>& frags() { return frags_; }
  const std::vector<int32_t>& cell_pass() const { return cell_pass_; }

 private:
  std::vector<Frag> frags_;
  std::vector<int32_t> cell_pass_;
};

}  // namespace

extern "C" {

// Builds the scheduled per-row pass plan for one block.
//
// Outputs (caller-allocated):
//   r_dstart, r_dend, r_shift — int32 [max_passes * nrows], pass-major
//   pass_space                — int32 [max_passes]; 0 comp-source,
//                               1 out-source (valid for passes < P)
//   p0_out                    — int32[1]: number of comp-source passes
//
// Returns P (total passes, <= max_passes), or BT_ERR_CAPACITY when the
// block exceeds the pass budget, or another negative status on error.
int bt_plan_rows(int nseq, const int32_t* lit_ptr, const int32_t* lit_len,
                 const int32_t* off, const int32_t* mlen,
                 const int32_t* out_pos, int out_len, int nrows,
                 int max_passes, int32_t* r_dstart, int32_t* r_dend,
                 int32_t* r_shift, int32_t* pass_space, int32_t* p0_out) {
  if (nseq < 0 || out_len < 0 || nrows <= 0 || max_passes <= 0) {
    return BT_ERR_INVALID;
  }
  // The schedule's row tables are sized nrows; a block claiming to decode
  // past nrows*128 would index comp_slots/used out of bounds.
  if (static_cast<int64_t>(out_len) > static_cast<int64_t>(nrows) * 128) {
    return BT_ERR_INVALID;
  }
  Planner planner;
  const int max_frags = nrows * max_passes + 64;
  if (!planner.Build(nseq, lit_ptr, lit_len, off, mlen, out_pos, max_frags)) {
    return BT_ERR_CAPACITY;
  }
  // Coverage check.
  int32_t covered = 0;
  for (const Frag& f : planner.frags()) {
    if (f.dst != covered) return BT_ERR_IO;
    covered += f.len;
  }
  if (covered != out_len) return BT_ERR_IO;

  int p0 = 0;
  const int total = planner.Schedule(nrows, max_passes, &p0);
  if (total < 0) return BT_ERR_CAPACITY;

  const size_t cells = static_cast<size_t>(max_passes) * nrows;
  std::memset(r_dstart, 0, sizeof(int32_t) * cells);
  std::memset(r_dend, 0, sizeof(int32_t) * cells);
  std::memset(r_shift, 0, sizeof(int32_t) * cells);
  for (int p = 0; p < max_passes; ++p) {
    pass_space[p] = (p < p0) ? 0 : 1;
  }
  *p0_out = p0;

  for (const Frag& f : planner.frags()) {
    const int r0 = f.dst / 128;
    const int r1 = (f.dst + f.len - 1) / 128;
    for (int r = r0; r <= r1 && r < nrows; ++r) {
      const int pass = planner.cell_pass()[f.cell_base + (r - r0)];
      const size_t cell = static_cast<size_t>(pass) * nrows + r;
      // Clip the fragment range to this row: the full range would be
      // re-asserted at a different pass in the neighboring rows, and the
      // kernel's active mask must not fire early there.
      r_dstart[cell] = std::max(f.dst, r * 128);
      r_dend[cell] = std::min(f.dst + f.len, (r + 1) * 128);
      r_shift[cell] = f.shift;
    }
  }
  return total;
}

// Convenience: parse an LZ4/Snappy block and plan it in one call.
int bt_plan_block(int codec, const uint8_t* src, int src_len, int out_len,
                  int nrows, int max_passes, int32_t* r_dstart,
                  int32_t* r_dend, int32_t* r_shift, int32_t* pass_space,
                  int32_t* p0_out) {
  const int max_seq = src_len + 2;
  std::vector<int32_t> t(static_cast<size_t>(max_seq) * 5);
  int32_t* lit_ptr = t.data();
  int32_t* lit_len = lit_ptr + max_seq;
  int32_t* offv = lit_len + max_seq;
  int32_t* mlenv = offv + max_seq;
  int32_t* out_posv = mlenv + max_seq;
  int nseq;
  if (codec == BT_CODEC_LZ4) {
    nseq = bt_lz4_parse(src, src_len, max_seq, lit_ptr, lit_len, offv, mlenv,
                        out_posv);
  } else if (codec == BT_CODEC_SNAPPY) {
    nseq = bt_snappy_parse(src, src_len, max_seq, lit_ptr, lit_len, offv,
                           mlenv, out_posv);
  } else {
    return BT_ERR_INVALID;
  }
  if (nseq < 0) return nseq;
  return bt_plan_rows(nseq, lit_ptr, lit_len, offv, mlenv, out_posv, out_len,
                      nrows, max_passes, r_dstart, r_dend, r_shift,
                      pass_space, p0_out);
}

void bt_set_split_limit(int v) { g_split_limit = v < 1 ? 1 : v; }

}  // extern "C"
