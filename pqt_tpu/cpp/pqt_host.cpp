// Native host-side runtime for pqt_tpu: CSR inverted-file assembly, payload
// reordering, and TexMex dataset conversion.
//
// Role-equivalent of the reference's host runtime: the chunked DB merge of
// test/test1B.cpp:764-898 (counting + prefix + scatter, here as one stable
// counting sort), the payload re-layout the GPU does with sortIdxKernel
// (PerturbationProTree.cu:715-750), and the convert_* tools
// (convert/convert_fvecs.cpp).  NumPy's argsort is O(n log n) single-core
// and its fancy indexing is single-threaded; at 1e9 vectors both dominate
// the build, so these run natively with OpenMP.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC pqt_host.cpp -o libpqt_host.so

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <atomic>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Stable counting sort by bin id.
//   bin_ids: n int32 values in [0, hash_size)
//   counts:  hash_size int32 (out)
//   prefix:  hash_size int32 exclusive prefix (out)
//   order:   n int32, CSR permutation: order[csr_pos] = original index (out)
// Returns 0 on success, -1 on out-of-range ids.
int pqt_build_csr(const int32_t* bin_ids, int64_t n, int64_t hash_size,
                  int32_t* counts, int32_t* prefix, int32_t* order) {
    std::memset(counts, 0, hash_size * sizeof(int32_t));
    for (int64_t i = 0; i < n; ++i) {
        int32_t b = bin_ids[i];
        if (b < 0 || b >= hash_size) return -1;
        counts[b]++;
    }
    int64_t run = 0;
    for (int64_t b = 0; b < hash_size; ++b) {
        prefix[b] = (int32_t)run;
        run += counts[b];
    }
    // cursor array reuses prefix values; scatter in input order = stable.
    int32_t* cursor = new int32_t[hash_size];
    std::memcpy(cursor, prefix, hash_size * sizeof(int32_t));
    for (int64_t i = 0; i < n; ++i) {
        order[cursor[bin_ids[i]]++] = (int32_t)i;
    }
    delete[] cursor;
    return 0;
}

// Parallel row gather: out[i] = src[order[i]] for rows of row_bytes bytes.
void pqt_gather_rows(const uint8_t* src, const int32_t* order, int64_t n,
                     int64_t row_bytes, uint8_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        std::memcpy(out + i * row_bytes,
                    src + (int64_t)order[i] * row_bytes, row_bytes);
    }
}

// Streaming-merge placement (the hot loop of ChunkedDBBuilder.finalize /
// merge_chunk_files, test1B.cpp:804-898's host merge): assign each chunk
// row its CSR position by advancing per-bin cursors in INPUT order —
// stable by construction, one linear pass (NumPy needs an O(n log n)
// argsort plus run-length bookkeeping to express the same thing).
//   bins: n int32 LOCAL bin ids; cursor: per-bin next-position (int64,
//   updated in place); pos: n int64 out.
void pqt_place_positions(const int32_t* bins, int64_t n, int64_t* cursor,
                         int64_t* pos) {
    for (int64_t i = 0; i < n; ++i) pos[i] = cursor[bins[i]]++;
}

// Parallel row scatter: dst[pos[i]] = src[i] for rows of row_bytes bytes.
// pos entries are unique (fresh CSR positions), so rows write disjoint
// ranges and the loop parallelizes safely.
void pqt_scatter_rows(const uint8_t* src, const int64_t* pos, int64_t n,
                      int64_t row_bytes, uint8_t* dst) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        std::memcpy(dst + pos[i] * row_bytes, src + i * row_bytes,
                    row_bytes);
    }
}

// Merge per-chunk CSR bin ids with id offsets is just a concat on the host;
// the global sort above handles ordering.  This helper applies the chunk id
// offset in place (order[i] += offset) for shard-global ids.
void pqt_offset_ids(int32_t* ids, int64_t n, int32_t offset) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) ids[i] += offset;
}

// Strip TexMex per-vector headers: convert .fvecs/.bvecs/.ivecs payload
// (each row: int32 dim + dim elements of elem_bytes) into a dense array.
// src has n rows; returns 0 on success, -1 if a row's dim mismatches.
int pqt_strip_xvecs(const uint8_t* src, int64_t n, int64_t dim,
                    int64_t elem_bytes, uint8_t* out) {
    const int64_t row_in = 4 + dim * elem_bytes;
    const int64_t row_out = dim * elem_bytes;
    std::atomic<int> bad{0};
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        int32_t d;
        std::memcpy(&d, src + i * row_in, 4);
        if (d != dim) { bad.store(1); continue; }
        std::memcpy(out + i * row_out, src + i * row_in + 4, row_out);
    }
    return bad.load() ? -1 : 0;
}

// uint8 -> float32 widening cast (FileReader's cast, filereader.hpp:136-178).
void pqt_u8_to_f32(const uint8_t* src, int64_t n, float* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) out[i] = (float)src[i];
}

int pqt_num_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
