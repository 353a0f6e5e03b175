/* PHOC (Pyramidal Histogram Of Characters) — 604-dim text feature.
 *
 * Native counterpart of the framework's sole C component in the reference
 * (/root/reference/antmmf/utils/phoc/src/cphoc.c — a CPython extension).
 * This is a fresh implementation exposed as a plain C ABI for ctypes:
 *
 *     void build_phoc(const char *token, float *out604);
 *
 * Layout: unigrams a-z0-9 (36) at pyramid levels 2+3+4+5 = 14 regions → 504
 * dims, then the 50 most common English bigrams at level 2 → 100 dims.
 * A character occupying normalized span [i/n, (i+1)/n] is assigned to region
 * [j/L, (j+1)/L] when the overlap covers ≥ 50% of the character span.
 */

#include <string.h>

#define PHOC_DIM 604
#define N_UNIGRAMS 36
#define N_BIGRAMS 50

static const char *UNIGRAMS = "abcdefghijklmnopqrstuvwxyz0123456789";

/* table must match the reference exactly for feature compatibility
 * (/root/reference/antmmf/utils/phoc/src/cphoc.c:29) */
static const char *BIGRAMS[N_BIGRAMS] = {
    "th", "he", "in", "er", "an", "re", "es", "on", "st", "nt",
    "en", "at", "ed", "nd", "to", "or", "ea", "ti", "ar", "te",
    "ng", "al", "it", "as", "is", "ha", "et", "se", "ou", "of",
    "le", "sa", "ve", "ro", "ra", "ri", "hi", "ne", "me", "de",
    "co", "ta", "ec", "si", "ll", "so", "na", "li", "la", "el"
};

static int unigram_index(char c) {
    if (c >= 'A' && c <= 'Z') c = (char)(c - 'A' + 'a');
    const char *p = strchr(UNIGRAMS, c);
    return (p && c != '\0') ? (int)(p - UNIGRAMS) : -1;
}

static float occupancy_lo(int i, int n) { return (float)i / (float)n; }
static float occupancy_hi(int i, int n) { return (float)(i + 1) / (float)n; }

/* single-precision on purpose: the reference computes region overlap in
 * float (cphoc.c:56-61), and boundary spans that land exactly on 0.5
 * round differently in double — feature compatibility requires matching
 * its rounding bit-for-bit */
static int in_region(float clo, float chi, int region, int level) {
    float rlo = (float)region / (float)level;
    float rhi = (float)(region + 1) / (float)level;
    float lo = clo > rlo ? clo : rlo;
    float hi = chi < rhi ? chi : rhi;
    float ratio = (hi - lo) / (chi - clo);
    return ratio >= 0.5f ? 1 : 0;
}

void build_phoc(const char *token, float *out) {
    memset(out, 0, PHOC_DIM * sizeof(float));
    int n = (int)strlen(token);
    if (n == 0) return;

    static const int levels[4] = {2, 3, 4, 5};

    /* unigrams over levels 2..5 */
    for (int i = 0; i < n; i++) {
        int ci = unigram_index(token[i]);
        if (ci < 0) continue;
        float clo = occupancy_lo(i, n), chi = occupancy_hi(i, n);
        int offset = 0;
        for (int li = 0; li < 4; li++) {
            int L = levels[li];
            for (int r = 0; r < L; r++) {
                if (in_region(clo, chi, r, L))
                    out[(offset + r) * N_UNIGRAMS + ci] = 1.0f;
            }
            offset += L;
        }
    }

    /* bigrams at level 2; bigram i spans chars [i, i+2) */
    int base = 14 * N_UNIGRAMS;
    for (int i = 0; i + 1 < n; i++) {
        char lo_c = token[i], hi_c = token[i + 1];
        if (lo_c >= 'A' && lo_c <= 'Z') lo_c = (char)(lo_c - 'A' + 'a');
        if (hi_c >= 'A' && hi_c <= 'Z') hi_c = (char)(hi_c - 'A' + 'a');
        for (int b = 0; b < N_BIGRAMS; b++) {
            if (BIGRAMS[b][0] == lo_c && BIGRAMS[b][1] == hi_c) {
                /* span of the bigram = [i/n, (i+2)/n] */
                float clo = occupancy_lo(i, n);
                float chi = (float)(i + 2) / (float)n;
                for (int r = 0; r < 2; r++) {
                    if (in_region(clo, chi, r, 2))
                        out[base + r * N_BIGRAMS + b] = 1.0f;
                }
                break;
            }
        }
    }
}

int phoc_dim(void) { return PHOC_DIM; }
