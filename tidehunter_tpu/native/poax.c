/* Native graph-POA MSA + row-column majority consensus.
 *
 * Re-expresses the partial-order-alignment oracle of ops/poa.py (itself
 * re-derived from Lee, Grasso & Sharlow 2002 / the abPOA contract visible
 * at reference src/abpoa_cons.c:12-120) in C for host speed: the numpy
 * oracle walks the graph one node per Python iteration (~0.1 reads/s on
 * the protocol workloads), this walk is a flat int32 row DP (~100x).
 *
 * Bit-exactness with the Python oracle is the contract — every
 * tie-breaking rule is replicated:
 *   - predecessor scan: strict '>' updates, first predecessor wins ties,
 *     virtual source (-1) appended last;
 *   - insertion prefix-max scan: '>=' updates, later opener wins ties;
 *   - end-node choice: max (H, -topo_rank) over end nodes in ascending
 *     node-id order, first maximum wins;
 *   - consensus argmax: smaller base code wins ties.
 * Parity is fuzz-pinned by tests/test_poa_native.py.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define NEG (-(1 << 30))

typedef struct {
    int32_t *a;
    int32_t n, cap;
} ivec;

static int iv_push(ivec *v, int32_t x) {
    if (v->n == v->cap) {
        int32_t nc = v->cap ? v->cap * 2 : 4;
        int32_t *na = (int32_t *)realloc(v->a, (size_t)nc * sizeof(int32_t));
        if (!na) return -1;
        v->a = na;
        v->cap = nc;
    }
    v->a[v->n++] = x;
    return 0;
}

static int iv_has(const ivec *v, int32_t x) {
    for (int32_t i = 0; i < v->n; i++)
        if (v->a[i] == x) return 1;
    return 0;
}

typedef struct {
    int64_t max_nodes;
    int64_t n;            /* current node count */
    uint8_t *base;        /* node -> base code */
    int32_t *group;       /* node -> column group id */
    int64_t ngroups;
    ivec *preds, *succs;  /* insertion-order adjacency */
    ivec *group_nodes;    /* group -> node ids (insertion order) */
    uint8_t *is_start, *is_end;
    /* rows: flattened (node, base) pairs per sequence */
    int32_t *row_node;
    uint8_t *row_base;
    int64_t row_len;
    int64_t *row_off;     /* n_seqs+1 offsets */
    int64_t nrows;
} graph;

static int64_t g_new_node(graph *g, int bse, int64_t grp) {
    int64_t nid = g->n++;
    g->base[nid] = (uint8_t)bse;
    if (grp < 0) {
        grp = g->ngroups++;
    }
    g->group[nid] = (int32_t)grp;
    if (iv_push(&g->group_nodes[grp], (int32_t)nid)) return -1;
    return nid;
}

static int g_add_edge(graph *g, int64_t u, int64_t v) {
    if (u < 0) return 0;
    if (!iv_has(&g->succs[u], (int32_t)v)) {
        if (iv_push(&g->succs[u], (int32_t)v)) return -1;
        if (iv_push(&g->preds[v], (int32_t)u)) return -1;
    }
    return 0;
}

/* scratch shared across align calls (grown to fit) */
typedef struct {
    int32_t *order, *rank, *indeg, *stack;
    int32_t *H, *D1, *D2;
    int8_t *bt_state, *bt_ostate;
    int32_t *bt_mpred, *bt_dpred0, *bt_dpred1, *bt_iopen0, *bt_iopen1;
    uint8_t *bt_dcont; /* bit0 = track1, bit1 = track2 */
    int32_t *src_row;
    int32_t *best_m, *best_mp, *best_d1, *best_d1p, *best_d2, *best_d2p;
    uint8_t *best_d1c, *best_d2c;
    int32_t *Mrow, *Orow, *i1, *i2, *op1, *op2, *sub;
    int32_t *path_v, *path_j; /* backtrack output, reversed order */
    int64_t cells_cap, nodes_cap, row_cap, path_cap;
} scratch;

static void sc_free(scratch *s) {
    free(s->order); free(s->rank); free(s->indeg); free(s->stack);
    free(s->H); free(s->D1); free(s->D2);
    free(s->bt_state); free(s->bt_ostate); free(s->bt_mpred);
    free(s->bt_dpred0); free(s->bt_dpred1);
    free(s->bt_iopen0); free(s->bt_iopen1); free(s->bt_dcont);
    free(s->src_row);
    free(s->best_m); free(s->best_mp);
    free(s->best_d1); free(s->best_d1p); free(s->best_d2); free(s->best_d2p);
    free(s->best_d1c); free(s->best_d2c);
    free(s->Mrow); free(s->Orow); free(s->i1); free(s->i2);
    free(s->op1); free(s->op2); free(s->sub);
    free(s->path_v); free(s->path_j);
    memset(s, 0, sizeof(*s));
}

static int sc_fit(scratch *s, int64_t n, int64_t L) {
    int64_t L1 = L + 1;
    int64_t cells = n * L1;
    if (n > s->nodes_cap) {
        int64_t nc = n * 2;
        free(s->order); free(s->rank); free(s->indeg); free(s->stack);
        s->order = (int32_t *)malloc((size_t)nc * 4);
        s->rank = (int32_t *)malloc((size_t)nc * 4);
        s->indeg = (int32_t *)malloc((size_t)nc * 4);
        s->stack = (int32_t *)malloc((size_t)nc * 4);
        if (!s->order || !s->rank || !s->indeg || !s->stack) return -1;
        s->nodes_cap = nc;
    }
    if (cells > s->cells_cap) {
        int64_t nc = cells + cells / 4;
        free(s->H); free(s->D1); free(s->D2);
        free(s->bt_state); free(s->bt_ostate); free(s->bt_mpred);
        free(s->bt_dpred0); free(s->bt_dpred1);
        free(s->bt_iopen0); free(s->bt_iopen1); free(s->bt_dcont);
        s->H = (int32_t *)malloc((size_t)nc * 4);
        s->D1 = (int32_t *)malloc((size_t)nc * 4);
        s->D2 = (int32_t *)malloc((size_t)nc * 4);
        s->bt_state = (int8_t *)malloc((size_t)nc);
        s->bt_ostate = (int8_t *)malloc((size_t)nc);
        s->bt_mpred = (int32_t *)malloc((size_t)nc * 4);
        s->bt_dpred0 = (int32_t *)malloc((size_t)nc * 4);
        s->bt_dpred1 = (int32_t *)malloc((size_t)nc * 4);
        s->bt_iopen0 = (int32_t *)malloc((size_t)nc * 4);
        s->bt_iopen1 = (int32_t *)malloc((size_t)nc * 4);
        s->bt_dcont = (uint8_t *)malloc((size_t)nc);
        if (!s->H || !s->D1 || !s->D2 || !s->bt_state || !s->bt_ostate ||
            !s->bt_mpred || !s->bt_dpred0 || !s->bt_dpred1 ||
            !s->bt_iopen0 || !s->bt_iopen1 || !s->bt_dcont)
            return -1;
        s->cells_cap = nc;
    }
    if (L1 > s->row_cap) {
        int64_t nc = L1 * 2;
        free(s->src_row);
        free(s->best_m); free(s->best_mp);
        free(s->best_d1); free(s->best_d1p);
        free(s->best_d2); free(s->best_d2p);
        free(s->best_d1c); free(s->best_d2c);
        free(s->Mrow); free(s->Orow); free(s->i1); free(s->i2);
        free(s->op1); free(s->op2); free(s->sub);
        s->src_row = (int32_t *)malloc((size_t)nc * 4);
        s->best_m = (int32_t *)malloc((size_t)nc * 4);
        s->best_mp = (int32_t *)malloc((size_t)nc * 4);
        s->best_d1 = (int32_t *)malloc((size_t)nc * 4);
        s->best_d1p = (int32_t *)malloc((size_t)nc * 4);
        s->best_d2 = (int32_t *)malloc((size_t)nc * 4);
        s->best_d2p = (int32_t *)malloc((size_t)nc * 4);
        s->best_d1c = (uint8_t *)malloc((size_t)nc);
        s->best_d2c = (uint8_t *)malloc((size_t)nc);
        s->Mrow = (int32_t *)malloc((size_t)nc * 4);
        s->Orow = (int32_t *)malloc((size_t)nc * 4);
        s->i1 = (int32_t *)malloc((size_t)nc * 4);
        s->i2 = (int32_t *)malloc((size_t)nc * 4);
        s->op1 = (int32_t *)malloc((size_t)nc * 4);
        s->op2 = (int32_t *)malloc((size_t)nc * 4);
        s->sub = (int32_t *)malloc((size_t)nc * 4);
        if (!s->src_row || !s->best_m || !s->best_mp || !s->best_d1 ||
            !s->best_d1p || !s->best_d2 || !s->best_d2p || !s->best_d1c ||
            !s->best_d2c || !s->Mrow || !s->Orow || !s->i1 || !s->i2 ||
            !s->op1 || !s->op2 || !s->sub)
            return -1;
        s->row_cap = nc;
    }
    if (n + L + 2 > s->path_cap) {
        int64_t nc = (n + L + 2) * 2;
        free(s->path_v); free(s->path_j);
        s->path_v = (int32_t *)malloc((size_t)nc * 4);
        s->path_j = (int32_t *)malloc((size_t)nc * 4);
        if (!s->path_v || !s->path_j) return -1;
        s->path_cap = nc;
    }
    return 0;
}

/* Topological order matching the Python oracle: initial zero-indegree
 * stack sorted descending then popped (=> ascending visit), pushes in
 * succs order (ops/poa.py _topo_order). */
static void topo_order(const graph *g, scratch *s) {
    int64_t n = g->n;
    for (int64_t v = 0; v < n; v++) s->indeg[v] = g->preds[v].n;
    int64_t sp = 0;
    for (int64_t v = n - 1; v >= 0; v--)
        if (s->indeg[v] == 0) s->stack[sp++] = (int32_t)v;
    int64_t no = 0;
    while (sp > 0) {
        int32_t v = s->stack[--sp];
        s->order[no++] = v;
        const ivec *su = &g->succs[v];
        for (int32_t i = 0; i < su->n; i++) {
            int32_t w = su->a[i];
            if (--s->indeg[w] == 0) s->stack[sp++] = w;
        }
    }
    for (int64_t i = 0; i < no; i++) s->rank[s->order[i]] = (int32_t)i;
}

/* Global alignment of seq (codes 0..4) to the graph. Fills
 * s->path_v/path_j with the traceback IN REVERSE and returns its length,
 * or -1 on allocation failure. Pair semantics match ops/poa.py align():
 * (v,j) match/mismatch, (v,-1) node deleted, (-1,j) base inserted. */
static int64_t g_align(graph *g, scratch *s, const uint8_t *seq, int64_t L,
                       int32_t match, int32_t mismatch,
                       int32_t o1, int32_t e1, int32_t o2, int32_t e2) {
    int64_t n = g->n;
    int64_t L1 = L + 1;
    if (sc_fit(s, n, L)) return -1;
    topo_order(g, s);

    int32_t oe1 = o1 + e1, oe2 = o2 + e2;
    s->src_row[0] = 0;
    for (int64_t j = 1; j <= L; j++) {
        int32_t g1 = o1 + (int32_t)j * e1, g2 = o2 + (int32_t)j * e2;
        s->src_row[j] = -(g1 < g2 ? g1 : g2);
    }

    for (int64_t oi = 0; oi < n; oi++) {
        int64_t v = s->order[oi];
        int bv = g->base[v];
        for (int64_t j = 0; j < L; j++)
            s->sub[j] = (seq[j] == bv) ? match : -mismatch;

        int32_t *bm = s->best_m, *bmp = s->best_mp;
        int32_t *b1 = s->best_d1, *b1p = s->best_d1p;
        int32_t *b2 = s->best_d2, *b2p = s->best_d2p;
        uint8_t *b1c = s->best_d1c, *b2c = s->best_d2c;
        for (int64_t j = 0; j < L; j++) { bm[j] = NEG; bmp[j] = -1; }
        for (int64_t j = 0; j <= L; j++) {
            b1[j] = NEG; b1p[j] = -1; b1c[j] = 0;
            b2[j] = NEG; b2p[j] = -1; b2c[j] = 0;
        }
        const ivec *pv = &g->preds[v];
        int np = pv->n;
        int with_src = (np == 0 || g->is_start[v]) ? 1 : 0;
        for (int pi = 0; pi < np + with_src; pi++) {
            int32_t u = (pi < np) ? pv->a[pi] : -1;
            const int32_t *hu = (u < 0) ? s->src_row : s->H + (int64_t)u * L1;
            const int32_t *d1u = (u < 0) ? NULL : s->D1 + (int64_t)u * L1;
            const int32_t *d2u = (u < 0) ? NULL : s->D2 + (int64_t)u * L1;
            for (int64_t j = 0; j < L; j++) {
                int32_t c = hu[j];
                if (c > bm[j]) { bm[j] = c; bmp[j] = u; }
            }
            for (int64_t j = 0; j <= L; j++) {
                int32_t dopen = hu[j] - oe1;
                int32_t dcont = (d1u ? d1u[j] : NEG) - e1;
                int32_t cand = dopen > dcont ? dopen : dcont;
                if (cand > b1[j]) {
                    b1[j] = cand; b1p[j] = u;
                    b1c[j] = (uint8_t)(dcont > dopen);
                }
                dopen = hu[j] - oe2;
                dcont = (d2u ? d2u[j] : NEG) - e2;
                cand = dopen > dcont ? dopen : dcont;
                if (cand > b2[j]) {
                    b2[j] = cand; b2p[j] = u;
                    b2c[j] = (uint8_t)(dcont > dopen);
                }
            }
        }

        int64_t off = v * L1;
        int32_t *Mrow = s->Mrow, *O = s->Orow;
        int8_t *ost = s->bt_ostate + off;
        Mrow[0] = NEG;
        for (int64_t j = 0; j < L; j++) Mrow[j + 1] = bm[j] + s->sub[j];
        for (int64_t j = 0; j <= L; j++) {
            int8_t o = 0;
            int32_t m = Mrow[j];
            if (b1[j] > m) o = 1;
            int32_t mx = m > b1[j] ? m : b1[j];
            if (b2[j] > mx) o = 2;
            ost[j] = o;
            O[j] = mx > b2[j] ? mx : b2[j];
        }
        /* insertion tracks: prefix-max over openers, >= updates (later
         * opener wins ties), matching _ins_scan in ops/poa.py */
        {
            int32_t rmax = O[0], rarg = 0;
            s->i1[0] = NEG; s->op1[0] = -1;
            for (int64_t j = 1; j <= L; j++) {
                s->i1[j] = rmax - oe1 - (int32_t)(j - 1) * e1;
                s->op1[j] = rarg;
                int32_t keyed = O[j] + (int32_t)j * e1;
                if (keyed >= rmax) { rmax = keyed; rarg = (int32_t)j; }
            }
            rmax = O[0]; rarg = 0;
            s->i2[0] = NEG; s->op2[0] = -1;
            for (int64_t j = 1; j <= L; j++) {
                s->i2[j] = rmax - oe2 - (int32_t)(j - 1) * e2;
                s->op2[j] = rarg;
                int32_t keyed = O[j] + (int32_t)j * e2;
                if (keyed >= rmax) { rmax = keyed; rarg = (int32_t)j; }
            }
        }
        int32_t *Hrow = s->H + off;
        int8_t *st = s->bt_state + off;
        for (int64_t j = 0; j <= L; j++) {
            int8_t t = ost[j];
            int32_t o = O[j];
            if (s->i1[j] > o) t = 3;
            int32_t mo = o > s->i1[j] ? o : s->i1[j];
            if (s->i2[j] > mo) t = 4;
            st[j] = t;
            Hrow[j] = mo > s->i2[j] ? mo : s->i2[j];
        }
        memcpy(s->D1 + off, b1, (size_t)L1 * 4);
        memcpy(s->D2 + off, b2, (size_t)L1 * 4);
        s->bt_mpred[off] = -1;
        for (int64_t j = 0; j < L; j++) s->bt_mpred[off + 1 + j] = bmp[j];
        for (int64_t j = 0; j <= L; j++) {
            s->bt_dcont[off + j] = (uint8_t)(b1c[j] | (b2c[j] << 1));
            s->bt_dpred0[off + j] = b1p[j];
            s->bt_dpred1[off + j] = b2p[j];
            s->bt_iopen0[off + j] = s->op1[j];
            s->bt_iopen1[off + j] = s->op2[j];
        }
    }

    /* end node: max (H[v][L], -rank[v]) over end nodes ascending */
    int64_t best_v = -1;
    int32_t best_h = 0, best_r = 0;
    for (int64_t v = 0; v < n; v++) {
        if (!g->is_end[v]) continue;
        int32_t h = s->H[v * L1 + L];
        if (best_v < 0 || h > best_h ||
            (h == best_h && s->rank[v] < best_r)) {
            best_v = v; best_h = h; best_r = s->rank[v];
        }
    }

    /* backtrack (reversed into path_v/path_j) */
    int64_t pn = 0;
    int64_t v = best_v, j = L;
    int state = s->bt_state[v * L1 + j];
    for (;;) {
        if (state == 3 || state == 4) {
            int tr = state - 3;
            int64_t jo = tr ? s->bt_iopen1[v * L1 + j]
                            : s->bt_iopen0[v * L1 + j];
            for (int64_t jj = j - 1; jj >= jo; jj--) {
                s->path_v[pn] = -1; s->path_j[pn] = (int32_t)jj; pn++;
            }
            j = jo;
            state = s->bt_ostate[v * L1 + j];
            continue;
        }
        if (state == 0) {
            s->path_v[pn] = (int32_t)v; s->path_j[pn] = (int32_t)(j - 1); pn++;
            int64_t u = s->bt_mpred[v * L1 + j];
            j -= 1;
            if (u == -1) {
                for (int64_t jj = j - 1; jj >= 0; jj--) {
                    s->path_v[pn] = -1; s->path_j[pn] = (int32_t)jj; pn++;
                }
                break;
            }
            v = u;
            state = s->bt_state[v * L1 + j];
        } else {
            int tr = state - 1;
            s->path_v[pn] = (int32_t)v; s->path_j[pn] = -1; pn++;
            int cont = (s->bt_dcont[v * L1 + j] >> tr) & 1;
            int64_t u = tr ? s->bt_dpred1[v * L1 + j]
                           : s->bt_dpred0[v * L1 + j];
            if (u == -1) {
                for (int64_t jj = j - 1; jj >= 0; jj--) {
                    s->path_v[pn] = -1; s->path_j[pn] = (int32_t)jj; pn++;
                }
                break;
            }
            v = u;
            if (!cont) state = s->bt_state[v * L1 + j];
        }
    }
    return pn;
}

/* Insert an aligned sequence along the (reversed) path. */
static int g_add_aligned(graph *g, const uint8_t *seq, const int32_t *pv,
                         const int32_t *pj, int64_t pn) {
    int64_t prev = -1, first = -1;
    /* path arrays are reversed: walk from the end */
    for (int64_t i = pn - 1; i >= 0; i--) {
        int32_t v = pv[i], j = pj[i];
        if (j == -1) continue; /* deleted node */
        int c = seq[j];
        int64_t node;
        if (v != -1) {
            if (g->base[v] == c) {
                node = v;
            } else {
                node = -1;
                const ivec *gn = &g->group_nodes[g->group[v]];
                for (int32_t k = 0; k < gn->n; k++) {
                    if (g->base[gn->a[k]] == c) { node = gn->a[k]; break; }
                }
                if (node == -1) {
                    node = g_new_node(g, c, g->group[v]);
                    if (node < 0) return -1;
                }
            }
        } else {
            node = g_new_node(g, c, -1);
            if (node < 0) return -1;
        }
        if (g_add_edge(g, prev, node)) return -1;
        prev = node;
        if (first == -1) first = node;
        g->row_node[g->row_len] = (int32_t)node;
        g->row_base[g->row_len] = (uint8_t)c;
        g->row_len++;
    }
    if (first >= 0) g->is_start[first] = 1;
    if (prev >= 0) g->is_end[prev] = 1;
    g->row_off[++g->nrows] = g->row_len;
    return 0;
}

/* Column layering of the group DAG (longest path); falls back to
 * creation order on a cycle, matching msa_columns in ops/poa.py.
 * Returns the number of columns; col_rank[g] = output position. */
static int64_t msa_columns(const graph *g, int32_t *col_rank) {
    int64_t ng = g->ngroups;
    ivec *gsucc = (ivec *)calloc((size_t)ng, sizeof(ivec));
    int32_t *gindeg = (int32_t *)calloc((size_t)ng, 4);
    int32_t *layer = (int32_t *)calloc((size_t)ng, 4);
    int32_t *stack = (int32_t *)malloc((size_t)ng * 4);
    int32_t *out = (int32_t *)malloc((size_t)ng * 4);
    if (!gsucc || !gindeg || !layer || !stack || !out) goto fail;
    for (int64_t u = 0; u < g->n; u++) {
        int32_t gu = g->group[u];
        const ivec *su = &g->succs[u];
        for (int32_t i = 0; i < su->n; i++) {
            int32_t gw = g->group[su->a[i]];
            if (gw != gu && !iv_has(&gsucc[gu], gw)) {
                if (iv_push(&gsucc[gu], gw)) goto fail;
                gindeg[gw]++;
            }
        }
    }
    {
        int64_t sp = 0, no = 0;
        for (int64_t v = ng - 1; v >= 0; v--)
            if (gindeg[v] == 0) stack[sp++] = (int32_t)v;
        while (sp > 0) {
            int32_t v = stack[--sp];
            out[no++] = v;
            const ivec *su = &gsucc[v];
            for (int32_t i = 0; i < su->n; i++) {
                int32_t w = su->a[i];
                if (layer[w] < layer[v] + 1) layer[w] = layer[v] + 1;
                if (--gindeg[w] == 0) stack[sp++] = w;
            }
        }
        if (no < ng) {
            /* cycle: creation order */
            for (int64_t i = 0; i < ng; i++) col_rank[i] = (int32_t)i;
        } else {
            /* stable sort of groups by (layer, id): counting sort on layer
             * keeps ascending-id order within a layer */
            int32_t maxl = 0;
            for (int64_t i = 0; i < ng; i++)
                if (layer[i] > maxl) maxl = layer[i];
            int32_t *cnt = (int32_t *)calloc((size_t)maxl + 2, 4);
            if (!cnt) goto fail;
            for (int64_t i = 0; i < ng; i++) cnt[layer[i] + 1]++;
            for (int32_t l = 1; l <= maxl + 1; l++) cnt[l] += cnt[l - 1];
            for (int64_t i = 0; i < ng; i++)
                col_rank[i] = cnt[layer[i]]++;
            free(cnt);
        }
    }
    for (int64_t i = 0; i < ng; i++) free(gsucc[i].a);
    free(gsucc); free(gindeg); free(layer); free(stack); free(out);
    return ng;
fail:
    if (gsucc) { for (int64_t i = 0; i < ng; i++) free(gsucc[i].a); }
    free(gsucc); free(gindeg); free(layer); free(stack); free(out);
    return -1;
}

/* Full MSA + consensus. seqs = concatenated 0..4 codes, lens[n_seqs].
 * Writes consensus bases and per-base coverage; returns consensus length
 * or -1 on failure (caller falls back to the Python oracle). cap must be
 * >= sum(lens). */
int64_t th_poa_msa(const uint8_t *seqs, const int64_t *lens, int64_t n_seqs,
                   int64_t match, int64_t mismatch,
                   int64_t o1, int64_t e1, int64_t o2, int64_t e2,
                   uint8_t *cons_out, int64_t *cov_out, int64_t cap) {
    if (n_seqs < 1) return -1;
    int64_t total = 0;
    for (int64_t i = 0; i < n_seqs; i++) total += lens[i];
    if (total > cap || total <= 0) return -1;

    graph g;
    memset(&g, 0, sizeof(g));
    g.max_nodes = total;
    g.base = (uint8_t *)malloc((size_t)total);
    g.group = (int32_t *)malloc((size_t)total * 4);
    g.preds = (ivec *)calloc((size_t)total, sizeof(ivec));
    g.succs = (ivec *)calloc((size_t)total, sizeof(ivec));
    g.group_nodes = (ivec *)calloc((size_t)total, sizeof(ivec));
    g.is_start = (uint8_t *)calloc((size_t)total, 1);
    g.is_end = (uint8_t *)calloc((size_t)total, 1);
    g.row_node = (int32_t *)malloc((size_t)total * 4);
    g.row_base = (uint8_t *)malloc((size_t)total);
    g.row_off = (int64_t *)malloc((size_t)(n_seqs + 1) * 8);
    scratch sc;
    memset(&sc, 0, sizeof(sc));
    int64_t ret = -1;
    int32_t *col_rank = NULL;
    int64_t *counts = NULL;
    if (!g.base || !g.group || !g.preds || !g.succs || !g.group_nodes ||
        !g.is_start || !g.is_end || !g.row_node || !g.row_base || !g.row_off)
        goto done;

    /* first sequence: a simple chain */
    {
        const uint8_t *s0 = seqs;
        int64_t L0 = lens[0];
        if (L0 <= 0) goto done;
        int64_t prev = -1;
        g.row_off[0] = 0;
        for (int64_t i = 0; i < L0; i++) {
            int64_t nid = g_new_node(&g, s0[i], -1);
            if (nid < 0 || g_add_edge(&g, prev, nid)) goto done;
            prev = nid;
            g.row_node[g.row_len] = (int32_t)nid;
            g.row_base[g.row_len] = s0[i];
            g.row_len++;
        }
        g.is_start[0] = 1;
        g.is_end[prev] = 1;
        g.row_off[++g.nrows] = g.row_len;
    }

    {
        const uint8_t *sp = seqs + lens[0];
        for (int64_t si = 1; si < n_seqs; si++) {
            int64_t L = lens[si];
            if (L <= 0) goto done;
            int64_t pn = g_align(&g, &sc, sp, L,
                                 (int32_t)match, (int32_t)mismatch,
                                 (int32_t)o1, (int32_t)e1,
                                 (int32_t)o2, (int32_t)e2);
            if (pn < 0) goto done;
            if (g_add_aligned(&g, sp, sc.path_v, sc.path_j, pn)) goto done;
            sp += L;
        }
    }

    /* consensus */
    col_rank = (int32_t *)malloc((size_t)g.ngroups * 4);
    if (!col_rank) goto done;
    {
        int64_t ncol = msa_columns(&g, col_rank);
        if (ncol < 0) goto done;
        counts = (int64_t *)calloc((size_t)ncol * 5, 8);
        if (!counts) goto done;
        for (int64_t i = 0; i < g.row_len; i++) {
            int32_t col = col_rank[g.group[g.row_node[i]]];
            counts[(int64_t)col * 5 + g.row_base[i]]++;
        }
        int64_t nout = 0;
        for (int64_t c = 0; c < ncol; c++) {
            const int64_t *row = counts + c * 5;
            int best = 0;
            int64_t bc = row[0], tot = row[0];
            for (int b = 1; b < 5; b++) {
                tot += row[b];
                if (row[b] > bc) { bc = row[b]; best = b; }
            }
            int64_t gap = g.nrows - tot;
            if (bc > gap) {
                cons_out[nout] = (uint8_t)best;
                cov_out[nout] = bc;
                nout++;
            }
        }
        ret = nout;
    }

done:
    free(col_rank); free(counts);
    sc_free(&sc);
    if (g.preds) for (int64_t i = 0; i < g.n; i++) free(g.preds[i].a);
    if (g.succs) for (int64_t i = 0; i < g.n; i++) free(g.succs[i].a);
    if (g.group_nodes)
        for (int64_t i = 0; i < g.ngroups; i++) free(g.group_nodes[i].a);
    free(g.preds); free(g.succs); free(g.group_nodes);
    free(g.base); free(g.group); free(g.is_start); free(g.is_end);
    free(g.row_node); free(g.row_base); free(g.row_off);
    return ret;
}
