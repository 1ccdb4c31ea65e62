// Native host kernels for empanada_tpu.
//
// These replace the reference's numba nopython kernels
// (empanada/array_utils.py, empanada/zarr_utils.py,
//  empanada/inference/watershed.py) with C++ implementations exposed via a
// plain C ABI and loaded through ctypes (no pybind11 in this environment).
//
// Everything here is host-side stitching/IO work: connected components over
// RLE runs, two-pointer RLE set ops, k-of-n pixel voting, instance filling,
// and the inherently sequential heap watershed.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Union-find connected components over horizontal runs.
// Runs must be sorted row-major (guaranteed by extract_runs).
// Two runs connect iff |row diff| == 1, same value, and column intervals
// touch (8-connectivity pads by 1 for diagonal adjacency).
// Output comp ids are numbered 1..k in order of first appearance.
// ---------------------------------------------------------------------------

static int64_t uf_find(std::vector<int64_t>& parent, int64_t x) {
    int64_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
        int64_t next = parent[x];
        parent[x] = root;
        x = next;
    }
    return root;
}

static void uf_union(std::vector<int64_t>& parent, int64_t a, int64_t b) {
    int64_t ra = uf_find(parent, a);
    int64_t rb = uf_find(parent, b);
    if (ra == rb) return;
    if (ra < rb) parent[rb] = ra; else parent[ra] = rb;
}

void cc_runs(const int64_t* values, const int64_t* rows, const int64_t* col_starts,
             const int64_t* col_ends, int64_t n, int connectivity, int64_t* out_comp) {
    if (n == 0) return;
    std::vector<int64_t> parent(n);
    for (int64_t i = 0; i < n; ++i) parent[i] = i;
    const int64_t pad = (connectivity == 8) ? 1 : 0;

    // index of the first run of each row segment
    int64_t prev_begin = 0, prev_end = 0;  // runs of row r-1 in [prev_begin, prev_end)
    int64_t cur_begin = 0;
    while (cur_begin < n) {
        int64_t cur_row = rows[cur_begin];
        int64_t cur_end = cur_begin;
        while (cur_end < n && rows[cur_end] == cur_row) ++cur_end;

        if (prev_end > prev_begin && rows[prev_begin] == cur_row - 1) {
            int64_t i = prev_begin, j = cur_begin;
            while (i < prev_end && j < cur_end) {
                if (col_ends[i] + pad <= col_starts[j]) { ++i; }
                else if (col_ends[j] + pad <= col_starts[i]) { ++j; }
                else {
                    if (values[i] == values[j]) uf_union(parent, i, j);
                    if (col_ends[i] < col_ends[j]) ++i; else ++j;
                }
            }
        }
        prev_begin = cur_begin;
        prev_end = cur_end;
        cur_begin = cur_end;
    }

    // renumber roots by first appearance
    std::vector<int64_t> remap(n, 0);
    int64_t next_id = 1;
    for (int64_t i = 0; i < n; ++i) {
        int64_t r = uf_find(parent, i);
        if (remap[r] == 0) remap[r] = next_id++;
        out_comp[i] = remap[r];
    }
}

// ---------------------------------------------------------------------------
// Two-pointer intersection between two sorted disjoint range sets.
// ---------------------------------------------------------------------------

int64_t range_intersection(const int64_t* a, int64_t na, const int64_t* b, int64_t nb) {
    int64_t total = 0;
    int64_t i = 0, j = 0;
    while (i < na && j < nb) {
        int64_t lo = std::max(a[2 * i], b[2 * j]);
        int64_t hi = std::min(a[2 * i + 1], b[2 * j + 1]);
        if (hi > lo) total += hi - lo;
        if (a[2 * i + 1] < b[2 * j + 1]) ++i; else ++j;
    }
    return total;
}

// ---------------------------------------------------------------------------
// Two-pointer union of two sorted disjoint range sets into a sorted
// disjoint output (adjacent/overlapping ranges coalesce).  The cross-slice
// matcher merges instance RLEs on every false-split absorption
// (reference matcher.py:14 merge_attrs) — a concat+sort there costs ~50 us
// per merge in numpy; this is linear.  Returns the output count (<= na+nb).
// ---------------------------------------------------------------------------

int64_t range_union(const int64_t* a, int64_t na, const int64_t* b, int64_t nb,
                    int64_t* out) {
    int64_t i = 0, j = 0, n_out = 0;
    int64_t cur_s = 0, cur_e = -1;
    bool open = false;
    while (i < na || j < nb) {
        int64_t s, e;
        if (j >= nb || (i < na && a[2 * i] <= b[2 * j])) {
            s = a[2 * i]; e = a[2 * i + 1]; ++i;
        } else {
            s = b[2 * j]; e = b[2 * j + 1]; ++j;
        }
        if (!open) {
            cur_s = s; cur_e = e; open = true;
        } else if (s <= cur_e) {
            if (e > cur_e) cur_e = e;
        } else {
            out[2 * n_out] = cur_s;
            out[2 * n_out + 1] = cur_e;
            ++n_out;
            cur_s = s; cur_e = e;
        }
    }
    if (open) {
        out[2 * n_out] = cur_s;
        out[2 * n_out + 1] = cur_e;
        ++n_out;
    }
    return n_out;
}

// ---------------------------------------------------------------------------
// Batched grouped range union: members of group g occupy
// ranges[group_offsets[g] : group_offsets[g+1]); each group's ranges are
// sorted by start and coalesced (overlap or adjacency) into the output.
// out has capacity n_ranges; out_offsets (n_groups+1) receives group
// extents.  One call replaces thousands of per-group numpy unions in the
// cross-slice matcher's false-split merging.
// ---------------------------------------------------------------------------

int64_t batch_range_union(const int64_t* ranges, const int64_t* group_offsets,
                          int64_t n_groups, int64_t* out, int64_t* out_offsets) {
    int64_t n_out = 0;
    out_offsets[0] = 0;
    std::vector<std::pair<int64_t, int64_t>> buf;
    for (int64_t g = 0; g < n_groups; ++g) {
        int64_t lo = group_offsets[g], hi = group_offsets[g + 1];
        buf.clear();
        buf.reserve(hi - lo);
        for (int64_t i = lo; i < hi; ++i)
            buf.emplace_back(ranges[2 * i], ranges[2 * i + 1]);
        std::sort(buf.begin(), buf.end());
        bool open = false;
        int64_t cs = 0, ce = -1;
        for (const auto& r : buf) {
            if (!open) { cs = r.first; ce = r.second; open = true; }
            else if (r.first <= ce) { if (r.second > ce) ce = r.second; }
            else {
                out[2 * n_out] = cs; out[2 * n_out + 1] = ce; ++n_out;
                cs = r.first; ce = r.second;
            }
        }
        if (open) { out[2 * n_out] = cs; out[2 * n_out + 1] = ce; ++n_out; }
        out_offsets[g + 1] = n_out;
    }
    return n_out;
}

// ---------------------------------------------------------------------------
// Batched pairwise intersection: all instances' ranges live in one flat
// buffer with per-instance [row_offsets[i], row_offsets[i+1]) extents;
// for each (a, b) pair, two-pointer intersection.  Replaces a per-pair
// Python loop in the Hungarian matcher.
// ---------------------------------------------------------------------------

void batch_pair_intersection(const int64_t* ranges, const int64_t* row_offsets,
                             const int64_t* pairs, int64_t n_pairs,
                             int64_t max_threads, int64_t* out) {
    auto work = [&](int64_t begin, int64_t end) {
        for (int64_t k = begin; k < end; ++k) {
            int64_t a = pairs[2 * k], b = pairs[2 * k + 1];
            const int64_t* ra = ranges + 2 * row_offsets[a];
            const int64_t* rb = ranges + 2 * row_offsets[b];
            out[k] = range_intersection(ra, row_offsets[a + 1] - row_offsets[a],
                                        rb, row_offsets[b + 1] - row_offsets[b]);
        }
    };
    // pairs are independent and outputs disjoint — thread the scan for the
    // consensus workload (3D instances carry tens of thousands of runs).
    // max_threads <= 0 means auto; callers already inside a thread pool
    // pass 1 to avoid oversubscription.
    const int64_t kMinPairsPerThread = 64;
    int64_t n_threads = max_threads > 0
        ? max_threads
        : static_cast<int64_t>(std::thread::hardware_concurrency());
    if (n_threads > 8) n_threads = 8;
    if (n_threads > n_pairs / kMinPairsPerThread)
        n_threads = n_pairs / kMinPairsPerThread;
    if (n_threads < 2) {
        work(0, n_pairs);
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    int64_t chunk = (n_pairs + n_threads - 1) / n_threads;
    for (int64_t t = 0; t < n_threads; ++t) {
        int64_t begin = t * chunk;
        int64_t end = std::min(n_pairs, begin + chunk);
        if (begin >= end) break;
        threads.emplace_back(work, begin, end);
    }
    for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// k-of-n coverage voting over sorted (by start) ranges.
// Writes at most `n` output ranges; returns the count.
// ---------------------------------------------------------------------------

int64_t vote_ranges(const int64_t* ranges, int64_t n, int64_t vote_thr, int64_t* out) {
    if (n == 0) return 0;
    // event sweep
    std::vector<std::pair<int64_t, int64_t>> events;
    events.reserve(2 * n);
    for (int64_t i = 0; i < n; ++i) {
        events.emplace_back(ranges[2 * i], 1);
        events.emplace_back(ranges[2 * i + 1], -1);
    }
    std::sort(events.begin(), events.end());

    int64_t count = 0, coverage = 0, run_start = 0, n_out = 0;
    bool in_run = false;
    size_t k = 0;
    while (k < events.size()) {
        int64_t pos = events[k].first;
        while (k < events.size() && events[k].first == pos) {
            coverage += events[k].second;
            ++k;
        }
        if (!in_run && coverage >= vote_thr) {
            run_start = pos;
            in_run = true;
        } else if (in_run && coverage < vote_thr) {
            out[2 * n_out] = run_start;
            out[2 * n_out + 1] = pos;
            ++n_out;
            in_run = false;
        }
        (void)count;
    }
    return n_out;
}

// ---------------------------------------------------------------------------
// k-of-n coverage voting over k individually SORTED DISJOINT range sets
// (valid RLEs).  Each set's event stream (s0, e0, s1, e1, ...) is already
// non-decreasing, so a k-way merge replaces the O(n log n) event sort of
// vote_ranges — the consensus hot spot at ortho-plane scale where clusters
// carry tens of thousands of 3D runs.  Set g occupies
// ranges[set_offsets[g] : set_offsets[g+1]).  Returns the output count.
// vote_thr == 1 computes the plain union (adjacent ranges coalesce).
// ---------------------------------------------------------------------------

int64_t vote_sorted_sets(const int64_t* ranges, const int64_t* set_offsets,
                         int64_t n_sets, int64_t vote_thr, int64_t* out) {
    // per-set cursor: next event index (2*i = start of range i, 2*i+1 = end)
    std::vector<int64_t> cur(n_sets), lim(n_sets);
    for (int64_t g = 0; g < n_sets; ++g) {
        cur[g] = 2 * set_offsets[g];
        lim[g] = 2 * set_offsets[g + 1];
    }
    auto event_pos = [&](int64_t g) {
        // flat ranges buffer: event k of the stream is ranges[k] with
        // starts at even k, ends at odd k (pairs are (start, end))
        return ranges[cur[g]];
    };

    int64_t coverage = 0, run_start = 0, n_out = 0;
    bool in_run = false;
    while (true) {
        // find the minimum next event position across sets
        int64_t pos = INT64_MAX;
        for (int64_t g = 0; g < n_sets; ++g)
            if (cur[g] < lim[g]) pos = std::min(pos, event_pos(g));
        if (pos == INT64_MAX) break;
        // consume ALL events at this position before evaluating coverage
        for (int64_t g = 0; g < n_sets; ++g) {
            while (cur[g] < lim[g] && event_pos(g) == pos) {
                coverage += (cur[g] & 1) ? -1 : 1;
                ++cur[g];
            }
        }
        if (!in_run && coverage >= vote_thr) {
            run_start = pos;
            in_run = true;
        } else if (in_run && coverage < vote_thr) {
            out[2 * n_out] = run_start;
            out[2 * n_out + 1] = pos;
            ++n_out;
            in_run = false;
        }
    }
    return n_out;
}

// ---------------------------------------------------------------------------
// Fill a flat int array with instance_id over the given (start, end) ranges.
// ---------------------------------------------------------------------------

void fill_ranges_i32(int32_t* flat, const int64_t* ranges, int64_t n, int32_t value) {
    for (int64_t i = 0; i < n; ++i) {
        int64_t s = ranges[2 * i], e = ranges[2 * i + 1];
        std::fill(flat + s, flat + e, value);
    }
}

void fill_ranges_i64(int64_t* flat, const int64_t* ranges, int64_t n, int64_t value) {
    for (int64_t i = 0; i < n; ++i) {
        int64_t s = ranges[2 * i], e = ranges[2 * i + 1];
        std::fill(flat + s, flat + e, value);
    }
}

void fill_ranges_u32(uint32_t* flat, const int64_t* ranges, int64_t n, uint32_t value) {
    for (int64_t i = 0; i < n; ++i) {
        int64_t s = ranges[2 * i], e = ranges[2 * i + 1];
        std::fill(flat + s, flat + e, value);
    }
}

// ---------------------------------------------------------------------------
// Heap ("age"-priority) watershed on a binary mask, seeded by markers.
// Matches the reference's simplified watershed semantics
// (empanada/inference/watershed.py:52): BFS flood in heap-pop order where
// priority is insertion age.  Inherently sequential -> host C++.
// flat arrays are padded by the caller; neighborhood offsets are precomputed.
// ---------------------------------------------------------------------------

void mask_watershed(const uint8_t* mask, int64_t size,
                    const int64_t* marker_locations, int64_t n_markers,
                    const int64_t* neighborhood, int64_t n_neigh,
                    int64_t* output) {
    typedef std::pair<int64_t, int64_t> Elem;  // (age, index)
    std::priority_queue<Elem, std::vector<Elem>, std::greater<Elem>> heap;
    int64_t age = 0;
    for (int64_t m = 0; m < n_markers; ++m) heap.emplace(0, marker_locations[m]);

    while (!heap.empty()) {
        Elem elem = heap.top();
        heap.pop();
        ++age;
        for (int64_t k = 0; k < n_neigh; ++k) {
            int64_t nb = elem.second + neighborhood[k];
            if (nb < 0 || nb >= size) continue;
            if (!mask[nb]) continue;
            if (output[nb]) continue;
            output[nb] = output[elem.second];
            heap.emplace(age, nb);
        }
    }
}

// ---------------------------------------------------------------------------
// Grayscale heap watershed: flood from markers in order of (image value,
// insertion age) — the classic priority-flood used by skimage.watershed.
// `image` is the flooding priority (pass -semantic to flood bright first).
// ---------------------------------------------------------------------------

void gray_watershed(const float* image, const uint8_t* mask, int64_t size,
                    const int64_t* marker_locations, int64_t n_markers,
                    const int64_t* neighborhood, int64_t n_neigh,
                    int64_t* output) {
    struct Elem {
        float value;
        int64_t age;
        int64_t index;
        bool operator>(const Elem& o) const {
            if (value != o.value) return value > o.value;
            return age > o.age;
        }
    };
    std::priority_queue<Elem, std::vector<Elem>, std::greater<Elem>> heap;
    int64_t age = 0;
    for (int64_t m = 0; m < n_markers; ++m) {
        int64_t idx = marker_locations[m];
        heap.push({image[idx], age++, idx});
    }
    while (!heap.empty()) {
        Elem elem = heap.top();
        heap.pop();
        for (int64_t k = 0; k < n_neigh; ++k) {
            int64_t nb = elem.index + neighborhood[k];
            if (nb < 0 || nb >= size) continue;
            if (!mask[nb]) continue;
            if (output[nb]) continue;
            output[nb] = output[elem.index];
            heap.push({image[nb], age++, nb});
        }
    }
}

// ---------------------------------------------------------------------------
// Sweep-line box overlap pairs.
//
// Emits (i, j) index pairs of boxes with strictly positive intersection in
// every dimension (the reference screened candidates with a dense numba
// pairwise box IoU, empanada/array_utils.py:178; the numpy replacement is a
// chunked O(n*m) boolean pass).  This sweep over axis 0 is output-sensitive:
// work = #axis0-overlapping pairs, which on real EM instance sets is
// near-linear in n.
//
// Boxes are (n, 2*nd) int64 [lo_0..lo_{nd-1}, hi_0..hi_{nd-1}].  The two
// sets may alias (self-join): every ordered pair, including the diagonal,
// is then emitted exactly once, matching box_iou(boxes).nonzero().
// Returns the pair count, or -1 if `cap` pairs would be exceeded.
// ---------------------------------------------------------------------------

int64_t box_overlap_pairs(const int64_t* boxes1, int64_t n1,
                          const int64_t* boxes2, int64_t n2,
                          int64_t nd, int64_t* out, int64_t cap) {
    struct Event {
        int64_t coord;
        int32_t kind;   // 0 = end (processed first at equal coord), 1 = start
        int32_t set;    // 0 = boxes1, 1 = boxes2
        int64_t idx;
    };
    std::vector<Event> events;
    events.reserve(2 * (n1 + n2));
    const int64_t* boxes[2] = {boxes1, boxes2};
    const int64_t counts[2] = {n1, n2};
    for (int s = 0; s < 2; ++s) {
        for (int64_t i = 0; i < counts[s]; ++i) {
            const int64_t* b = boxes[s] + 2 * nd * i;
            bool degenerate = false;
            for (int64_t d = 0; d < nd; ++d)
                if (b[nd + d] <= b[d]) { degenerate = true; break; }
            if (degenerate) continue;  // hi > lo required in every dim
            events.push_back({b[0], 1, (int32_t)s, i});
            events.push_back({b[nd], 0, (int32_t)s, i});
        }
    }
    std::sort(events.begin(), events.end(), [](const Event& a, const Event& b) {
        if (a.coord != b.coord) return a.coord < b.coord;
        if (a.kind != b.kind) return a.kind < b.kind;
        if (a.set != b.set) return a.set < b.set;
        return a.idx < b.idx;
    });

    // active lists with O(1) swap-removal
    std::vector<int64_t> active[2];
    std::vector<int64_t> pos[2];
    pos[0].assign(n1, -1);
    pos[1].assign(n2, -1);

    int64_t n_out = 0;
    for (const Event& ev : events) {
        std::vector<int64_t>& own = active[ev.set];
        std::vector<int64_t>& own_pos = pos[ev.set];
        if (ev.kind == 0) {  // end: remove
            int64_t p = own_pos[ev.idx];
            own_pos[own.back()] = p;
            std::swap(own[p], own.back());
            own.pop_back();
            own_pos[ev.idx] = -1;
            continue;
        }
        // start: scan the OTHER set's active list for full-dim overlap
        int other = 1 - ev.set;
        const int64_t* bi = boxes[ev.set] + 2 * nd * ev.idx;
        for (int64_t j : active[other]) {
            const int64_t* bj = boxes[other] + 2 * nd * j;
            bool hit = true;
            for (int64_t d = 1; d < nd; ++d) {
                int64_t lo = std::max(bi[d], bj[d]);
                int64_t hi = std::min(bi[nd + d], bj[nd + d]);
                if (hi <= lo) { hit = false; break; }
            }
            if (!hit) continue;
            if (n_out >= cap) return -1;
            if (ev.set == 0) {
                out[2 * n_out] = ev.idx;
                out[2 * n_out + 1] = j;
            } else {
                out[2 * n_out] = j;
                out[2 * n_out + 1] = ev.idx;
            }
            ++n_out;
        }
        own_pos[ev.idx] = (int64_t)own.size();
        own.push_back(ev.idx);
    }
    return n_out;
}

// ---------------------------------------------------------------------------
// Split sorted ranges at chunk boundaries: a position p belongs to chunk
// (p % modulo) / divisor; ranges crossing a boundary are split so each output
// range lies in exactly one chunk along this axis.
// Worst case output size: n + total_boundaries_crossed; caller passes a
// buffer of capacity `cap` range pairs; returns count or -1 if overflow.
// ---------------------------------------------------------------------------

int64_t chunk_split_ranges(const int64_t* ranges, int64_t n, int64_t modulo,
                           int64_t divisor, int64_t* out, int64_t cap) {
    int64_t n_out = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t s = ranges[2 * i], e = ranges[2 * i + 1];
        while (s < e) {
            // end of the current chunk-aligned region containing s:
            // next position where (p % modulo) % divisor == 0 or p % modulo == 0
            int64_t rem = s % modulo;
            int64_t chunk_off = rem % divisor;
            int64_t next_boundary = s + (divisor - chunk_off);
            // boundary can't pass the modulo wrap
            int64_t mod_boundary = s + (modulo - rem);
            if (mod_boundary < next_boundary) next_boundary = mod_boundary;
            int64_t piece_end = std::min(e, next_boundary);
            if (n_out >= cap) return -1;
            out[2 * n_out] = s;
            out[2 * n_out + 1] = piece_end;
            ++n_out;
            s = piece_end;
        }
    }
    return n_out;
}

}  // extern "C" (template helper below needs C++ linkage)

// ---------------------------------------------------------------------------
// Single-pass extraction of maximal horizontal runs of constant nonzero
// value from a dense (h, w) label map (the hot edge of pan_seg -> RLE;
// replaces the numpy not_equal/flatnonzero formulation in
// core/labeling.py:extract_runs).  Output arrays hold `cap` entries;
// returns the run count, -2 when cap is exceeded (caller retries with a
// bigger buffer), and — for the i32 entry point only — -1 when a negative
// value is seen (either a genuinely negative int32 map or a uint32 map
// reinterpreted as int32 with values >= 2^31; the caller retries via
// int64, preserving numpy-path semantics either way).
// ---------------------------------------------------------------------------

template <typename T, bool kFlagNegative>
static int64_t extract_runs_impl(const T* seg, int64_t h, int64_t w,
                                 int64_t cap, int64_t* values, int64_t* rows,
                                 int64_t* col_starts, int64_t* col_ends) {
    int64_t n = 0;
    for (int64_t r = 0; r < h; ++r) {
        const T* row = seg + r * w;
        int64_t c = 0;
        while (c < w) {
            const T v = row[c];
            if (v == 0) { ++c; continue; }
            if (kFlagNegative && v < 0) return -1;
            int64_t start = c;
            do { ++c; } while (c < w && row[c] == v);
            if (n >= cap) return -2;
            values[n] = static_cast<int64_t>(v);
            rows[n] = r;
            col_starts[n] = start;
            col_ends[n] = c;
            ++n;
        }
    }
    return n;
}

// ---------------------------------------------------------------------------
// Fused per-slice instance construction (the host 3D pipeline's hot build
// stage, stitch/rle_seg.py runs_to_rle_seg): class-window filter ->
// optional run-based connected components -> group runs by instance ->
// canonicalize (merge row-wrap-touching runs) -> FlatInstances arrays.
// One GIL-released call replaces an argsort + 6 reduceats + mask chain of
// numpy ops, so the MatcherWorker's seg-build pool scales across cores
// instead of serializing on the interpreter lock.
//
// Semantics mirror labeling.py runs_to_flat exactly (stable grouping by
// ascending value; boxes from pre-merge run extents; starts are raveled
// row * width + col); CC relabels to min_id + component with components
// numbered by first appearance, matching connected_components_runs.
// ---------------------------------------------------------------------------

static int64_t build_flat_impl(
    const int64_t* values, const int64_t* rows, const int64_t* cs,
    const int64_t* ce, int64_t n, int64_t width,
    int64_t min_id, int64_t max_id, int force_connected, int connectivity,
    int64_t* out_labels, int64_t* out_boxes, int64_t* out_offsets,
    int64_t* out_starts, int64_t* out_runs, int64_t* out_n_inst) {
    // 1) filter to the class window
    std::vector<int64_t> idx;
    idx.reserve(n);
    for (int64_t i = 0; i < n; ++i)
        if (values[i] >= min_id && values[i] < max_id) idx.push_back(i);
    const int64_t m = static_cast<int64_t>(idx.size());
    *out_n_inst = 0;
    out_offsets[0] = 0;
    if (m == 0) return 0;

    // 2) effective per-run value: CC component (+ min_id) or the raw value
    std::vector<int64_t> val(m), row(m), c0(m), c1(m);
    for (int64_t k = 0; k < m; ++k) {
        int64_t i = idx[k];
        val[k] = values[i];
        row[k] = rows[i];
        c0[k] = cs[i];
        c1[k] = ce[i];
    }
    if (force_connected && m > 0) {
        std::vector<int64_t> comp(m);
        cc_runs(val.data(), row.data(), c0.data(), c1.data(), m,
                connectivity, comp.data());
        for (int64_t k = 0; k < m; ++k) val[k] = comp[k] + min_id;
    }

    // 3) stable order by ascending value (runs stay row-major per value)
    std::vector<int64_t> order(m);
    for (int64_t k = 0; k < m; ++k) order[k] = k;
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) { return val[a] < val[b]; });

    // 4) walk groups: box from original extents; canonicalized RLE
    int64_t n_inst = 0;
    int64_t n_out = 0;
    int64_t g = 0;
    while (g < m) {
        const int64_t v = val[order[g]];
        int64_t y1 = INT64_MAX, y2 = INT64_MIN, x1 = INT64_MAX, x2 = INT64_MIN;
        int64_t group_first_out = n_out;
        while (g < m && val[order[g]] == v) {
            const int64_t k = order[g];
            if (row[k] < y1) y1 = row[k];
            if (row[k] > y2) y2 = row[k];
            if (c0[k] < x1) x1 = c0[k];
            if (c1[k] > x2) x2 = c1[k];
            const int64_t start = row[k] * width + c0[k];
            const int64_t len = c1[k] - c0[k];
            if (n_out > group_first_out &&
                out_starts[n_out - 1] + out_runs[n_out - 1] == start) {
                out_runs[n_out - 1] += len;  // touches across the row wrap
            } else {
                out_starts[n_out] = start;
                out_runs[n_out] = len;
                ++n_out;
            }
            ++g;
        }
        out_labels[n_inst] = v;
        out_boxes[4 * n_inst] = y1;
        out_boxes[4 * n_inst + 1] = x1;
        out_boxes[4 * n_inst + 2] = y2 + 1;
        out_boxes[4 * n_inst + 3] = x2;
        out_offsets[n_inst + 1] = n_out;
        ++n_inst;
    }
    *out_n_inst = n_inst;
    return n_out;
}

extern "C" {

int64_t extract_runs_i32(const int32_t* seg, int64_t h, int64_t w, int64_t cap,
                         int64_t* values, int64_t* rows,
                         int64_t* col_starts, int64_t* col_ends) {
    return extract_runs_impl<int32_t, true>(seg, h, w, cap, values, rows,
                                            col_starts, col_ends);
}

int64_t extract_runs_i64(const int64_t* seg, int64_t h, int64_t w, int64_t cap,
                         int64_t* values, int64_t* rows,
                         int64_t* col_starts, int64_t* col_ends) {
    return extract_runs_impl<int64_t, false>(seg, h, w, cap, values, rows,
                                             col_starts, col_ends);
}

int64_t runs_build_flat(
    const int64_t* values, const int64_t* rows, const int64_t* cs,
    const int64_t* ce, int64_t n, int64_t width,
    int64_t min_id, int64_t max_id, int force_connected, int connectivity,
    int64_t* out_labels, int64_t* out_boxes, int64_t* out_offsets,
    int64_t* out_starts, int64_t* out_runs, int64_t* out_n_inst) {
    return build_flat_impl(values, rows, cs, ce, n, width, min_id, max_id,
                           force_connected, connectivity, out_labels,
                           out_boxes, out_offsets, out_starts, out_runs,
                           out_n_inst);
}

// Packed variant: decodes ops.postprocess.encode_runs_packed rows
// ([starts(R) | values(R) | count] int16 per image row, values stored
// unsigned) straight into the builder — the drainer hands the raw device
// buffer to the seg-build pool and Python never touches the runs.
// Returns -1 when any row overflowed its R-run capacity (caller falls
// back to the dense map path, same contract as decode_runs_packed).
int64_t packed_build_flat(
    const int16_t* packed, int64_t h, int64_t rcap, int64_t width,
    int64_t min_id, int64_t max_id, int force_connected, int connectivity,
    int64_t* out_labels, int64_t* out_boxes, int64_t* out_offsets,
    int64_t* out_starts, int64_t* out_runs, int64_t* out_n_inst) {
    std::vector<int64_t> val, row, c0, c1;
    val.reserve(h * 8);
    row.reserve(h * 8);
    c0.reserve(h * 8);
    c1.reserve(h * 8);
    const int64_t stride = 2 * rcap + 1;
    for (int64_t y = 0; y < h; ++y) {
        const int16_t* buf = packed + y * stride;
        const int64_t count = buf[2 * rcap];
        if (count > rcap) return -1;
        for (int64_t k = 0; k < count; ++k) {
            const int64_t v =
                static_cast<int64_t>(static_cast<uint16_t>(buf[rcap + k]));
            if (v == 0) continue;  // background run (still delimits ends)
            const int64_t start = buf[k];
            const int64_t end = (k + 1 < count) ? buf[k + 1] : width;
            val.push_back(v);
            row.push_back(y);
            c0.push_back(start);
            c1.push_back(end);
        }
    }
    return build_flat_impl(val.data(), row.data(), c0.data(), c1.data(),
                           static_cast<int64_t>(val.size()), width, min_id,
                           max_id, force_connected, connectivity, out_labels,
                           out_boxes, out_offsets, out_starts, out_runs,
                           out_n_inst);
}

}  // extern "C"
