// Native runtime components for mlsgpu_tpu.
//
// The reference implements its entire host runtime in C++ (union-find
// src/union_find.h, mesher hash maps src/mesher.h:349-352, PLY decode
// src/fast_ply.cpp:334). These are the host-side hot paths at
// billion-splat scale, so they are native here too: a batch union-find
// operating on numpy-owned buffers, a 64-bit open-addressing hash map with
// batch get-or-insert (the mesher's key->clump / key->index maps), and a
// vectorized PLY record decoder.
//
// Plain C ABI, loaded via ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- unionfind
// Iterative find with path halving. parent is an int64 numpy buffer.
static inline int64_t uf_find(int64_t* parent, int64_t x) {
    while (parent[x] != x) {
        parent[x] = parent[parent[x]];
        x = parent[x];
    }
    return x;
}

void mls_uf_find_many(int64_t* parent, const int64_t* xs, int64_t* out,
                      int64_t n) {
    for (int64_t i = 0; i < n; i++) out[i] = uf_find(parent, xs[i]);
}

// Merge pairs, maintaining size plus up to `n_meta` extra int64 metadata
// arrays that accumulate child totals into the root (the reference's
// UnionFind node-metadata merge hook, src/union_find.h:51-212).
void mls_uf_merge_pairs(int64_t* parent, int64_t* size,
                        int64_t** meta, int64_t n_meta,
                        const int64_t* a, const int64_t* b, int64_t n) {
    for (int64_t i = 0; i < n; i++) {
        int64_t ra = uf_find(parent, a[i]);
        int64_t rb = uf_find(parent, b[i]);
        if (ra == rb) continue;
        if (size[ra] < size[rb]) { int64_t t = ra; ra = rb; rb = t; }
        parent[rb] = ra;
        size[ra] += size[rb];
        for (int64_t m = 0; m < n_meta; m++) meta[m][ra] += meta[m][rb];
    }
}

// ------------------------------------------------------------------ keymap
// Open-addressing hash map int64 -> int64 (linear probing, power-of-two
// capacity). EMPTY slots use key = INT64_MIN.
struct KeyMap {
    std::vector<int64_t> keys;
    std::vector<int64_t> vals;
    int64_t count;
    int64_t mask;
};

static const int64_t KM_EMPTY = INT64_MIN;

static void km_grow(KeyMap* km);

void* mls_keymap_new(int64_t capacity_hint) {
    KeyMap* km = new KeyMap();
    int64_t cap = 1024;
    while (cap < capacity_hint * 2) cap <<= 1;
    km->keys.assign(cap, KM_EMPTY);
    km->vals.assign(cap, 0);
    km->count = 0;
    km->mask = cap - 1;
    return km;
}

void mls_keymap_free(void* h) { delete static_cast<KeyMap*>(h); }

int64_t mls_keymap_size(void* h) { return static_cast<KeyMap*>(h)->count; }

static inline int64_t km_hash(int64_t k) {
    uint64_t x = (uint64_t)k;
    x ^= x >> 33; x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33; x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33;
    return (int64_t)x;
}

static void km_grow(KeyMap* km) {
    std::vector<int64_t> ok = std::move(km->keys);
    std::vector<int64_t> ov = std::move(km->vals);
    int64_t ncap = (km->mask + 1) * 2;
    km->keys.assign(ncap, KM_EMPTY);
    km->vals.assign(ncap, 0);
    km->mask = ncap - 1;
    for (size_t i = 0; i < ok.size(); i++) {
        if (ok[i] == KM_EMPTY) continue;
        int64_t slot = km_hash(ok[i]) & km->mask;
        while (km->keys[slot] != KM_EMPTY) slot = (slot + 1) & km->mask;
        km->keys[slot] = ok[i];
        km->vals[slot] = ov[i];
    }
}

// For each key: if present, out_vals = stored value, out_new = 0;
// else insert insert_vals[i], out_vals = insert_vals[i], out_new = 1.
void mls_keymap_get_or_insert(void* h, const int64_t* keys, int64_t n,
                              const int64_t* insert_vals,
                              int64_t* out_vals, uint8_t* out_new) {
    KeyMap* km = static_cast<KeyMap*>(h);
    for (int64_t i = 0; i < n; i++) {
        if ((km->count + 1) * 4 >= (km->mask + 1) * 3) km_grow(km);
        int64_t k = keys[i];
        int64_t slot = km_hash(k) & km->mask;
        while (true) {
            if (km->keys[slot] == k) {
                out_vals[i] = km->vals[slot];
                out_new[i] = 0;
                break;
            }
            if (km->keys[slot] == KM_EMPTY) {
                km->keys[slot] = k;
                km->vals[slot] = insert_vals[i];
                km->count++;
                out_vals[i] = insert_vals[i];
                out_new[i] = 1;
                break;
            }
            slot = (slot + 1) & km->mask;
        }
    }
}

void mls_keymap_lookup(void* h, const int64_t* keys, int64_t n,
                       int64_t* out_vals) {
    KeyMap* km = static_cast<KeyMap*>(h);
    for (int64_t i = 0; i < n; i++) {
        int64_t k = keys[i];
        int64_t slot = km_hash(k) & km->mask;
        out_vals[i] = -1;
        while (km->keys[slot] != KM_EMPTY) {
            if (km->keys[slot] == k) { out_vals[i] = km->vals[slot]; break; }
            slot = (slot + 1) & km->mask;
        }
    }
}

// Dump all items (for checkpointing). out_keys/out_vals sized keymap_size.
void mls_keymap_items(void* h, int64_t* out_keys, int64_t* out_vals) {
    KeyMap* km = static_cast<KeyMap*>(h);
    int64_t j = 0;
    for (size_t i = 0; i < km->keys.size(); i++) {
        if (km->keys[i] == KM_EMPTY) continue;
        out_keys[j] = km->keys[i];
        out_vals[j] = km->vals[i];
        j++;
    }
}

// -------------------------------------------------------------- ply decode
// Decode n fixed-stride little-endian records into the (n, 8) splat layout
// [x y z radius nx ny nz quality], applying the radius clamp + smooth scale
// and quality = 1/r^2 (src/fast_ply.cpp:334-350). offsets: byte offsets of
// x,y,z,nx,ny,nz,radius within a record.
static void decode_range(const char* buf, int64_t lo, int64_t hi,
                         int64_t stride, const int64_t* offsets,
                         float smooth, float max_radius, float* out) {
    for (int64_t i = lo; i < hi; i++) {
        const char* rec = buf + i * stride;
        float f[7];
        for (int j = 0; j < 7; j++)
            std::memcpy(&f[j], rec + offsets[j], 4);
        float r = f[6];
        if (r > max_radius) r = max_radius;  // NaN compares false: preserved
        r *= smooth;
        float* o = out + i * 8;
        o[0] = f[0]; o[1] = f[1]; o[2] = f[2];
        o[3] = r;
        o[4] = f[3]; o[5] = f[4]; o[6] = f[5];
        o[7] = 1.0f / (r * r);
    }
}

void mls_decode_splats(const char* buf, int64_t n, int64_t stride,
                       const int64_t* offsets, float smooth,
                       float max_radius, float* out) {
    decode_range(buf, 0, n, stride, offsets, smooth, max_radius, out);
}

// Parallel decode over row ranges (the reference's OpenMP decode loop,
// src/splat_set.cpp:213). Rows are independent, so a plain static split
// across std::threads suffices; callers pass nthreads = hardware cores.
void mls_decode_splats_mt(const char* buf, int64_t n, int64_t stride,
                          const int64_t* offsets, float smooth,
                          float max_radius, float* out, int64_t nthreads) {
    if (nthreads <= 1 || n < 1 << 16) {
        decode_range(buf, 0, n, stride, offsets, smooth, max_radius, out);
        return;
    }
    std::vector<std::thread> threads;
    threads.reserve((size_t)nthreads);
    for (int64_t t = 0; t < nthreads; t++) {
        int64_t lo = n * t / nthreads, hi = n * (t + 1) / nthreads;
        threads.emplace_back(decode_range, buf, lo, hi, stride, offsets,
                             smooth, max_radius, out);
    }
    for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------- blob RLE
// One pass of the blob precompute (pipeline/blobs.py, the reference's
// FastBlobSet::computeBlobs src/splat_set_impl.h:669-726): per-splat
// microblock ranges, run-length encoding against the carried run, cell
// bounding box and non-finite count. Float expressions mirror the numpy
// path exactly (f32 subtract/multiply then floorf) so the python and
// native paths produce identical blobs.
static inline int64_t floordiv_i64(int64_t a, int64_t b) {
    int64_t q = a / b;
    return (a % b != 0 && ((a < 0) != (b < 0))) ? q - 1 : q;
}

int64_t mls_blob_rle(const float* splats, int64_t n, int64_t first_id,
                     float inv_spacing, int64_t micro,
                     int64_t* carry,      // [valid, start, count, lo0..2, hi0..2]
                     int64_t* bbox,       // [min0..2, max0..2] (in/out)
                     int64_t* nonfinite,  // in/out
                     int64_t* out_start, int64_t* out_count,
                     int64_t* out_lo, int64_t* out_hi) {
    int64_t k = 0;
    for (int64_t i = 0; i < n; i++) {
        const float* s = splats + i * 8;
        bool finite = true;
        for (int j = 0; j < 8; j++) finite = finite && std::isfinite(s[j]);
        finite = finite && (s[3] > 0.0f);
        if (!finite) {
            (*nonfinite)++;
            if (carry[0]) {  // close the carried run
                out_start[k] = carry[1];
                out_count[k] = carry[2];
                for (int a = 0; a < 3; a++) {
                    out_lo[k * 3 + a] = carry[3 + a];
                    out_hi[k * 3 + a] = carry[6 + a];
                }
                k++;
                carry[0] = 0;
            }
            continue;
        }
        int64_t mlo[3], mhi[3];
        for (int a = 0; a < 3; a++) {
            float p = s[a], r = s[3];
            int64_t lo_c = (int64_t)std::floor((double)(float)((p - r) * inv_spacing));
            int64_t hi_c = (int64_t)std::floor((double)(float)((p + r) * inv_spacing));
            if (lo_c < bbox[a]) bbox[a] = lo_c;
            if (hi_c > bbox[3 + a]) bbox[3 + a] = hi_c;
            mlo[a] = floordiv_i64(lo_c, micro);
            mhi[a] = floordiv_i64(hi_c, micro);
        }
        bool same = carry[0] != 0;
        for (int a = 0; a < 3 && same; a++)
            same = (carry[3 + a] == mlo[a]) && (carry[6 + a] == mhi[a]);
        if (same) {
            carry[2]++;
        } else {
            if (carry[0]) {
                out_start[k] = carry[1];
                out_count[k] = carry[2];
                for (int a = 0; a < 3; a++) {
                    out_lo[k * 3 + a] = carry[3 + a];
                    out_hi[k * 3 + a] = carry[6 + a];
                }
                k++;
            }
            carry[0] = 1;
            carry[1] = first_id + i;
            carry[2] = 1;
            for (int a = 0; a < 3; a++) {
                carry[3 + a] = mlo[a];
                carry[6 + a] = mhi[a];
            }
        }
    }
    return k;
}

}  // extern "C"
