/* Local stub of the abPOA API surface used by TideHunter (the reference's
 * abPOA/ submodule is empty in this checkout, so the real library cannot be
 * built).  The stub's abpoa_msa returns the FIRST unit verbatim as the
 * consensus with per-base coverage = n_seqs.  That means:
 *   - harness timings measure the full reference pipeline EXCEPT the POA
 *     graph-DP itself (seed, chain, partition ksw2, ave_match ksw2, boundary
 *     extension ksw2, edlib adapter search all run for real);
 *   - timed numbers are therefore an UPPER BOUND on the true reference
 *     speed (the real binary does strictly more work per read).
 */
#ifndef ABPOA_STUB_H
#define ABPOA_STUB_H
#include <stdint.h>
#include <stdio.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
    int n_seq;
} abpoa_seqs_stub_t;

typedef struct {
    abpoa_seqs_stub_t *abs;
} abpoa_t;

typedef struct {
    int cons_agrm;
    int match, mismatch;
    int gap_open1, gap_ext1, gap_open2, gap_ext2;
    int out_cons, out_msa;
} abpoa_para_t;

abpoa_t *abpoa_init(void);
void abpoa_free(abpoa_t *ab);
abpoa_para_t *abpoa_init_para(void);
void abpoa_post_set_para(abpoa_para_t *abpt);
void abpoa_free_para(abpoa_para_t *abpt);
void abpoa_reset_graph(abpoa_t *ab, abpoa_para_t *abpt, int seq_len);
int abpoa_msa(abpoa_t *ab, abpoa_para_t *abpt, int n_seqs, char **names,
              int *seq_lens, uint8_t **bseqs, FILE *outfp,
              uint8_t ***cons_seq, int ***cons_cov, int **cons_l,
              int *cons_n, void *a, void *b);

#ifdef __cplusplus
}
#endif
#endif
