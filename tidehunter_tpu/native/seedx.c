/* Seeding: direct k-mer hashing + tandem self-hit generation (native).
 *
 * Exact-semantics implementation of the w=1 seeding path specified by the
 * reference seeder (reference src/tandem_hit.c:37-56,171-225) and pinned
 * by the NumPy oracle (ops/seeding.py): rolling 2-bit keys with N reset,
 * optional homopolymer compression keeping each run's last index, seeds
 * radix-sorted by (key, pos), each occurrence paired with its NEAREST
 * earlier same-key occurrence at distance >= min_p (kept iff <= max_p),
 * hits re-sorted by (end, period).
 *
 * The 1-core host VM makes per-read seeding part of the pipeline's
 * throughput floor; this replaces ~0.8 ms/read of NumPy with ~0.1 ms.
 *
 * Build: compiled into libchainx.so next to chainx.c (native/__init__.py).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* LSD radix sort (8-bit digits) of u64 values over an explicit ascending
 * list of byte positions.  A byte position that is constant across the
 * whole array is a stable identity pass, so callers skip positions that
 * are provably zero from value bounds (pos < L, period <= max_p, key
 * < 4^k) — typically halving the pass count. */
static void radix_u64_bytes(uint64_t *v, uint64_t *tmp, int64_t n,
                            const int *bytes, int nb)
{
    for (int bi = 0; bi < nb; ++bi) {
        int64_t cnt[257];
        memset(cnt, 0, sizeof(cnt));
        int sh = 8 * bytes[bi];
        for (int64_t i = 0; i < n; ++i)
            cnt[((v[i] >> sh) & 0xFF) + 1]++;
        for (int i = 0; i < 256; ++i)
            cnt[i + 1] += cnt[i];
        for (int64_t i = 0; i < n; ++i)
            tmp[cnt[(v[i] >> sh) & 0xFF]++] = v[i];
        uint64_t *t = v; v = tmp; tmp = t;
    }
    if (nb & 1)
        memcpy(tmp, v, n * 8);   /* odd passes: result sits in caller's tmp */
}

static int val_bytes(uint64_t maxval)
{
    if (maxval == 0) return 0;
    return (64 - __builtin_clzll(maxval) + 7) / 8;
}

/* out_ends/out_periods caps: L entries. Returns hit count. */
int64_t th_seed(
    const uint8_t *bseq, int64_t L, int64_t k, int hpc,
    int64_t min_p, int64_t max_p,
    int64_t *out_ends, int64_t *out_periods)
{
    if (L <= 0 || k <= 0 || k > 16)
        return 0;
    /* 1. stream (+ positions) — HPC keeps each equal-run's last index */
    uint8_t *stream = (uint8_t *)malloc(L);
    int32_t *spos = (int32_t *)malloc(L * 4);
    int64_t m = 0;
    if (hpc) {
        for (int64_t i = 0; i < L; ++i) {
            if (i + 1 < L && bseq[i + 1] == bseq[i])
                continue;
            stream[m] = bseq[i];
            spos[m++] = (int32_t)i;
        }
    } else {
        for (int64_t i = 0; i < L; ++i) {
            stream[i] = bseq[i];
            spos[i] = (int32_t)i;
        }
        m = L;
    }
    /* 2. rolling keys with N reset: seed (key, pos) once l >= k */
    uint64_t *seeds = (uint64_t *)malloc((m > 0 ? m : 1) * 8);
    int64_t ns = 0;
    uint32_t key = 0, mask = (uint32_t)((1ull << (2 * k)) - 1);
    int64_t l = 0;
    for (int64_t i = 0; i < m; ++i) {
        uint8_t c = stream[i];
        if (c < 4) {
            key = ((key << 2) | c) & mask;
            if (++l >= k)
                seeds[ns++] = ((uint64_t)key << 32) | (uint32_t)spos[i];
        } else {
            l = 0;
            key = 0;
        }
    }
    free(stream);
    free(spos);
    if (ns == 0) {
        free(seeds);
        return 0;
    }
    /* 3. sort seeds by (key, pos) — low 32 = pos (< L), high = key
     * (< 4^k): only the byte positions those bounds can populate */
    uint64_t *tmp = (uint64_t *)malloc(ns * 8);
    {
        int bytes[12], nb = 0;
        int np = val_bytes((uint64_t)(L - 1));
        int nk = (int)((2 * k + 7) / 8);
        for (int b = 0; b < np; ++b) bytes[nb++] = b;
        for (int b = 0; b < nk; ++b) bytes[nb++] = 4 + b;
        radix_u64_bytes(seeds, tmp, ns, bytes, nb);
    }
    /* 4. per occurrence: nearest earlier same-key occurrence >= min_p */
    uint64_t *hits = tmp;            /* reuse */
    int64_t nh = 0;
    int64_t gs = 0;                  /* group start */
    for (int64_t j = 0; j < ns; ++j) {
        if (j > 0 && (seeds[j] >> 32) != (seeds[j - 1] >> 32))
            gs = j;
        int64_t pj = (int64_t)(uint32_t)seeds[j];
        int64_t tgt = pj - min_p;
        if (tgt < 0 || j == gs)
            continue;
        /* largest i in [gs, j) with pos_i <= tgt (positions ascending) */
        int64_t lo = gs, hi = j - 1, found = -1;
        while (lo <= hi) {
            int64_t mid = (lo + hi) >> 1;
            if ((int64_t)(uint32_t)seeds[mid] <= tgt) {
                found = mid;
                lo = mid + 1;
            } else {
                hi = mid - 1;
            }
        }
        if (found < 0)
            continue;
        int64_t period = pj - (int64_t)(uint32_t)seeds[found];
        if (period > max_p)
            continue;
        hits[nh++] = ((uint64_t)(uint32_t)pj << 32) | (uint32_t)period;
    }
    if (nh == 0) {
        free(seeds);
        free(tmp);
        return 0;
    }
    /* 5. sort hits by (end, period): low 32 = period (<= max_p), high =
     * end (< L) */
    uint64_t *tmp2 = seeds;          /* reuse */
    {
        int bytes[12], nb = 0;
        int npd = val_bytes((uint64_t)max_p);
        int ne = val_bytes((uint64_t)(L - 1));
        for (int b = 0; b < npd; ++b) bytes[nb++] = b;
        for (int b = 0; b < ne; ++b) bytes[nb++] = 4 + b;
        radix_u64_bytes(hits, tmp2, nh, bytes, nb);
    }
    for (int64_t i = 0; i < nh; ++i) {
        out_ends[i] = (int64_t)(hits[i] >> 32);
        out_periods[i] = (int64_t)(uint32_t)hits[i];
    }
    free(seeds);
    free(tmp);
    return nh;
}
