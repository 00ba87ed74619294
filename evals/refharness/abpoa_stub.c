#include <stdlib.h>
#include <string.h>
#include "abpoa.h"

abpoa_t *abpoa_init(void) {
    abpoa_t *ab = (abpoa_t *)calloc(1, sizeof(abpoa_t));
    ab->abs = (abpoa_seqs_stub_t *)calloc(1, sizeof(abpoa_seqs_stub_t));
    return ab;
}
void abpoa_free(abpoa_t *ab) { free(ab->abs); free(ab); }
abpoa_para_t *abpoa_init_para(void) {
    return (abpoa_para_t *)calloc(1, sizeof(abpoa_para_t));
}
void abpoa_post_set_para(abpoa_para_t *abpt) { (void)abpt; }
void abpoa_free_para(abpoa_para_t *abpt) { free(abpt); }
void abpoa_reset_graph(abpoa_t *ab, abpoa_para_t *abpt, int seq_len) {
    (void)ab; (void)abpt; (void)seq_len;
}

/* Stub MSA: consensus = first unit verbatim, coverage = n_seqs everywhere.
 * See abpoa.h header comment for what this does/doesn't let us time. */
int abpoa_msa(abpoa_t *ab, abpoa_para_t *abpt, int n_seqs, char **names,
              int *seq_lens, uint8_t **bseqs, FILE *outfp,
              uint8_t ***cons_seq, int ***cons_cov, int **cons_l,
              int *cons_n, void *a, void *b) {
    (void)ab; (void)abpt; (void)names; (void)outfp; (void)a; (void)b;
    int L = seq_lens[0];
    uint8_t **cs = (uint8_t **)malloc(sizeof(uint8_t *));
    cs[0] = (uint8_t *)malloc(L > 0 ? L : 1);
    memcpy(cs[0], bseqs[0], L);
    int *cl = (int *)malloc(sizeof(int));
    cl[0] = L;
    *cons_seq = cs; *cons_l = cl; *cons_n = 1;
    if (cons_cov != NULL) {
        int **cc = (int **)malloc(sizeof(int *));
        cc[0] = (int *)malloc(sizeof(int) * (L > 0 ? L : 1));
        for (int i = 0; i < L; ++i) cc[0][i] = n_seqs;
        *cons_cov = cc;
    }
    return 0;
}
