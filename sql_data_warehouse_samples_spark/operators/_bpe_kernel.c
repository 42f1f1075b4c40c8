/* Compiled kernel for bpe_train_on_dict (operators/bpe.py).
 *
 * SAME algorithm as the pure-Python trainer, value-identical by
 * construction so the existing parity suite can assert equality:
 *
 *   - argmax pair by (count DESC, left-symbol ASC, right-symbol ASC),
 *     where symbol order is lexicographic over UTF-8 bytes — identical
 *     to Python str comparison (UTF-8 byte order == code-point order);
 *   - lazy max-heap with stale-entry revalidation against the live
 *     count map (re-push current count if still >= min_count);
 *   - per-word in-place rewrite, multiset-delta count maintenance;
 *   - symbols are INTERNED BY STRING (two merge paths producing the
 *     same string — e.g. "a"+"bc" and "ab"+"c" — share one symbol id),
 *     matching Python where symbols ARE their strings;
 *   - the where-index is append-only with stale entries skipped by the
 *     "did this word actually change" check — the same observable
 *     behavior as Python's set (a stale/duplicate entry rewrites
 *     nothing and contributes no delta).
 *
 * Compiled on demand by operators/bpe.py via `cc -O2 -shared -fPIC`
 * (import-try seam: no compiler / failed build => pure-Python fallback).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct { const char *p; int32_t len; } Sym;
typedef struct { int32_t *v; int64_t len, cap; } Vec32;
typedef struct {
    uint64_t key;   /* ((uint64)a<<32)|b */
    int64_t count;  /* 0 == absent */
    Vec32 where;
    uint8_t used;
} Slot;
typedef struct { Slot *slots; uint64_t cap, n; } Map;
typedef struct { int64_t count; int32_t a, b; } HeapEnt;
typedef struct { HeapEnt *v; int64_t len, cap; } Heap;
typedef struct { uint64_t hash; int32_t id; } ISlot; /* id == -1 empty */
typedef struct { ISlot *slots; uint64_t cap; } Intern;

static Sym *g_syms;
static int64_t g_nsyms;

static int symcmp(int32_t x, int32_t y) {
    if (x == y) return 0;
    const Sym *a = &g_syms[x], *b = &g_syms[y];
    int32_t m = a->len < b->len ? a->len : b->len;
    int c = memcmp(a->p, b->p, (size_t)m);
    if (c) return c;
    return (a->len > b->len) - (a->len < b->len);
}

/* priority: count DESC, then left/right symbol string ASC */
static int ent_before(const HeapEnt *x, const HeapEnt *y) {
    if (x->count != y->count) return x->count > y->count;
    int c = symcmp(x->a, y->a);
    if (c) return c < 0;
    return symcmp(x->b, y->b) < 0;
}

static int heap_push(Heap *h, int64_t count, int32_t a, int32_t b) {
    if (h->len == h->cap) {
        int64_t nc = h->cap ? h->cap * 2 : 1024;
        HeapEnt *nv = realloc(h->v, (size_t)nc * sizeof(HeapEnt));
        if (!nv) return 0;
        h->v = nv; h->cap = nc;
    }
    int64_t i = h->len++;
    h->v[i].count = count; h->v[i].a = a; h->v[i].b = b;
    while (i > 0) {
        int64_t p = (i - 1) / 2;
        if (!ent_before(&h->v[i], &h->v[p])) break;
        HeapEnt t = h->v[i]; h->v[i] = h->v[p]; h->v[p] = t;
        i = p;
    }
    return 1;
}

static HeapEnt heap_pop(Heap *h) {
    HeapEnt top = h->v[0];
    h->v[0] = h->v[--h->len];
    int64_t i = 0;
    for (;;) {
        int64_t l = 2 * i + 1, r = l + 1, m = i;
        if (l < h->len && ent_before(&h->v[l], &h->v[m])) m = l;
        if (r < h->len && ent_before(&h->v[r], &h->v[m])) m = r;
        if (m == i) break;
        HeapEnt t = h->v[i]; h->v[i] = h->v[m]; h->v[m] = t;
        i = m;
    }
    return top;
}

static uint64_t key_hash(uint64_t k) {
    k ^= k >> 33; k *= 0xff51afd7ed558ccdULL;
    k ^= k >> 33; k *= 0xc4ceb9fe1a85ec53ULL;
    k ^= k >> 33;
    return k;
}

static int map_grow(Map *m);

static Slot *map_find(Map *m, uint64_t key, int create) {
    if (create && m->n * 5 >= m->cap * 3) {
        if (!map_grow(m)) return NULL;
    }
    uint64_t mask = m->cap - 1, i = key_hash(key) & mask;
    for (;;) {
        Slot *s = &m->slots[i];
        if (!s->used) {
            if (!create) return NULL;
            s->used = 1; s->key = key; s->count = 0;
            s->where.v = NULL; s->where.len = s->where.cap = 0;
            m->n++;
            return s;
        }
        if (s->key == key) return s;
        i = (i + 1) & mask;
    }
}

static int map_grow(Map *m) {
    uint64_t ncap = m->cap * 2;
    Slot *ns = calloc(ncap, sizeof(Slot));
    if (!ns) return 0;
    uint64_t mask = ncap - 1;
    for (uint64_t j = 0; j < m->cap; j++) {
        Slot *s = &m->slots[j];
        if (!s->used) continue;
        uint64_t i = key_hash(s->key) & mask;
        while (ns[i].used) i = (i + 1) & mask;
        ns[i] = *s; /* Vec32 buffer pointer moves with the struct */
    }
    free(m->slots);
    m->slots = ns; m->cap = ncap;
    return 1;
}

static int vec_push(Vec32 *v, int32_t x) {
    if (v->len == v->cap) {
        int64_t nc = v->cap ? v->cap * 2 : 4;
        int32_t *nv = realloc(v->v, (size_t)nc * sizeof(int32_t));
        if (!nv) return 0;
        v->v = nv; v->cap = nc;
    }
    v->v[v->len++] = x;
    return 1;
}

static uint64_t bytes_hash(const char *p, int32_t n) {
    uint64_t h = 0xcbf29ce484222325ULL;
    for (int32_t i = 0; i < n; i++) {
        h ^= (uint8_t)p[i];
        h *= 0x100000001b3ULL;
    }
    return h;
}

/* lookup-or-add a symbol string; returns its id (== existing id when the
 * bytes match an interned symbol — string identity, the Python model). */
static int32_t intern_sym(Intern *in, const char *p, int32_t len,
                          int owned /* p is malloc'd; free if duplicate */) {
    uint64_t mask = in->cap - 1, i = bytes_hash(p, len) & mask;
    for (;;) {
        ISlot *s = &in->slots[i];
        if (s->id < 0) {
            s->hash = bytes_hash(p, len);
            s->id = (int32_t)g_nsyms;
            g_syms[g_nsyms].p = p;
            g_syms[g_nsyms].len = len;
            g_nsyms++;
            return s->id;
        }
        if (g_syms[s->id].len == len &&
            memcmp(g_syms[s->id].p, p, (size_t)len) == 0) {
            if (owned) free((void *)p);
            return s->id;
        }
        i = (i + 1) & mask;
    }
}

int64_t bpe_train_kernel(
    const int32_t *word_syms, const int64_t *word_offs, int64_t n_words,
    const int64_t *wcounts,
    const char *sym_bytes, const int64_t *sym_offs, int64_t n_syms0,
    int64_t n_merges, int64_t min_count,
    int32_t *out_a, int32_t *out_b, int64_t *out_count)
{
    int64_t produced = -1; /* -1 => allocation failure */
    int64_t sym_cap = n_syms0 + n_merges + 1;
    g_syms = calloc((size_t)sym_cap, sizeof(Sym));
    g_nsyms = 0;
    uint64_t icap = 64;
    while (icap < (uint64_t)sym_cap * 3) icap *= 2;
    Intern in = { malloc(icap * sizeof(ISlot)), icap };
    Map map = { calloc(1 << 16, sizeof(Slot)), 1 << 16, 0 };
    Heap heap = { NULL, 0, 0 };
    int32_t *wbuf = NULL; int32_t **wp = NULL; int64_t *wlen = NULL;
    char *merged_pool_guard = NULL; (void)merged_pool_guard;
    if (!g_syms || !in.slots || !map.slots) goto done;
    for (uint64_t i = 0; i < icap; i++) in.slots[i].id = -1;
    for (int64_t s = 0; s < n_syms0; s++) {
        intern_sym(&in, sym_bytes + sym_offs[s],
                   (int32_t)(sym_offs[s + 1] - sym_offs[s]), 0);
    }

    int64_t total = word_offs[n_words];
    wbuf = malloc((size_t)(total ? total : 1) * sizeof(int32_t));
    wp = malloc((size_t)(n_words ? n_words : 1) * sizeof(int32_t *));
    wlen = malloc((size_t)(n_words ? n_words : 1) * sizeof(int64_t));
    if (!wbuf || !wp || !wlen) goto done;
    memcpy(wbuf, word_syms, (size_t)total * sizeof(int32_t));
    for (int64_t w = 0; w < n_words; w++) {
        wp[w] = wbuf + word_offs[w];
        wlen[w] = word_offs[w + 1] - word_offs[w];
    }

    /* initial pair counts + where (dedupe consecutive same-word pushes) */
    for (int64_t w = 0; w < n_words; w++) {
        int64_t wc = wcounts[w];
        for (int64_t i = 0; i + 1 < wlen[w]; i++) {
            uint64_t key = ((uint64_t)(uint32_t)wp[w][i] << 32)
                           | (uint32_t)wp[w][i + 1];
            Slot *s = map_find(&map, key, 1);
            if (!s) goto done;
            s->count += wc;
            if (s->where.len == 0 || s->where.v[s->where.len - 1] != (int32_t)w)
                if (!vec_push(&s->where, (int32_t)w)) goto done;
        }
    }
    for (uint64_t j = 0; j < map.cap; j++) {
        Slot *s = &map.slots[j];
        if (s->used && s->count > 0)
            if (!heap_push(&heap, s->count,
                           (int32_t)(s->key >> 32), (int32_t)(uint32_t)s->key))
                goto done;
    }

    produced = 0;
    /* scratch for per-word pair multisets (word-length bounded) */
    int64_t scratch_cap = 64;
    uint64_t *pk_old = malloc(scratch_cap * sizeof(uint64_t));
    int32_t *pc_old = malloc(scratch_cap * sizeof(int32_t));
    uint64_t *pk_new = malloc(scratch_cap * sizeof(uint64_t));
    int32_t *pc_new = malloc(scratch_cap * sizeof(int32_t));
    if (!pk_old || !pc_old || !pk_new || !pc_new) { produced = -1; goto done2; }

    while (produced < n_merges && heap.len > 0) {
        HeapEnt top = heap_pop(&heap);
        uint64_t key = ((uint64_t)(uint32_t)top.a << 32) | (uint32_t)top.b;
        Slot *s = map_find(&map, key, 0);
        int64_t cur = (s && s->used) ? s->count : 0;
        if (cur != top.count) { /* stale entry: revalidate */
            if (cur >= min_count)
                if (!heap_push(&heap, cur, top.a, top.b)) { produced = -1; goto done2; }
            continue;
        }
        if (cur < min_count) break;
        out_a[produced] = top.a;
        out_b[produced] = top.b;
        out_count[produced] = cur;
        produced++;

        /* intern the merged symbol (string identity) */
        const Sym *sa = &g_syms[top.a], *sb = &g_syms[top.b];
        int32_t mlen = sa->len + sb->len;
        char *mp = malloc((size_t)(mlen ? mlen : 1));
        if (!mp) { produced = -1; goto done2; }
        memcpy(mp, sa->p, (size_t)sa->len);
        memcpy(mp + sa->len, sb->p, (size_t)sb->len);
        int32_t mid = intern_sym(&in, mp, mlen, 1);

        /* snapshot: the (l,r) where-vector only ever shrinks logically
         * (no new (l,r) adjacency can appear in a rewritten word), and
         * map growth moves the Slot but not the vector buffer */
        int32_t *wh = s->where.v;
        int64_t whn = s->where.len;
        for (int64_t x = 0; x < whn; x++) {
            int64_t w = wh[x];
            int32_t *syms = wp[w];
            int64_t n = wlen[w], wc = wcounts[w];
            /* does the pair still occur? (stale entries skip) */
            int found = 0;
            for (int64_t i = 0; i + 1 < n; i++)
                if (syms[i] == top.a && syms[i + 1] == top.b) { found = 1; break; }
            if (!found) continue;
            if (n > scratch_cap) {
                while (scratch_cap < n) scratch_cap *= 2;
                /* grow via temporaries: overwriting the pointers with a
                 * failed realloc's NULL would leak the originals before
                 * done2 frees them */
                uint64_t *tk_old = realloc(pk_old, scratch_cap * sizeof(uint64_t));
                if (tk_old) pk_old = tk_old;
                int32_t *tc_old = realloc(pc_old, scratch_cap * sizeof(int32_t));
                if (tc_old) pc_old = tc_old;
                uint64_t *tk_new = realloc(pk_new, scratch_cap * sizeof(uint64_t));
                if (tk_new) pk_new = tk_new;
                int32_t *tc_new = realloc(pc_new, scratch_cap * sizeof(int32_t));
                if (tc_new) pc_new = tc_new;
                if (!tk_old || !tc_old || !tk_new || !tc_new) { produced = -1; goto done2; }
            }
            /* old pair multiset (linear scans: words are short) */
            int64_t n_old = 0;
            for (int64_t i = 0; i + 1 < n; i++) {
                uint64_t k = ((uint64_t)(uint32_t)syms[i] << 32)
                             | (uint32_t)syms[i + 1];
                int64_t f = -1;
                for (int64_t q = 0; q < n_old; q++)
                    if (pk_old[q] == k) { f = q; break; }
                if (f < 0) { pk_old[n_old] = k; pc_old[n_old++] = 1; }
                else pc_old[f]++;
            }
            /* in-place rewrite (never grows) */
            int64_t j2 = 0, i2 = 0;
            while (i2 < n) {
                if (i2 + 1 < n && syms[i2] == top.a && syms[i2 + 1] == top.b) {
                    syms[j2++] = mid; i2 += 2;
                } else {
                    syms[j2++] = syms[i2++];
                }
            }
            wlen[w] = j2;
            /* new pair multiset */
            int64_t n_new = 0;
            for (int64_t i = 0; i + 1 < j2; i++) {
                uint64_t k = ((uint64_t)(uint32_t)syms[i] << 32)
                             | (uint32_t)syms[i + 1];
                int64_t f = -1;
                for (int64_t q = 0; q < n_new; q++)
                    if (pk_new[q] == k) { f = q; break; }
                if (f < 0) { pk_new[n_new] = k; pc_new[n_new++] = 1; }
                else pc_new[f]++;
            }
            /* apply deltas over old ∪ new */
            for (int64_t q = 0; q < n_old; q++) {
                int32_t newc = 0;
                for (int64_t r = 0; r < n_new; r++)
                    if (pk_new[r] == pk_old[q]) { newc = pc_new[r]; break; }
                int32_t d = newc - pc_old[q];
                if (d != 0 || newc == 0) {
                    Slot *ps = map_find(&map, pk_old[q], 1);
                    if (!ps) { produced = -1; goto done2; }
                    if (d != 0) {
                        int64_t nc2 = ps->count + (int64_t)d * wc;
                        ps->count = nc2 > 0 ? nc2 : 0;
                        if (nc2 > 0 && d > 0)
                            if (!heap_push(&heap, nc2,
                                           (int32_t)(pk_old[q] >> 32),
                                           (int32_t)(uint32_t)pk_old[q])) { produced = -1; goto done2; }
                    }
                    /* newc == 0: Python discards w from where — stale
                     * entries are skipped by the found-check instead */
                }
            }
            for (int64_t r = 0; r < n_new; r++) {
                int oldc = 0;
                for (int64_t q = 0; q < n_old; q++)
                    if (pk_old[q] == pk_new[r]) { oldc = pc_old[q]; break; }
                if (oldc == 0) { /* brand-new pair for this word */
                    Slot *ps = map_find(&map, pk_new[r], 1);
                    if (!ps) { produced = -1; goto done2; }
                    int64_t nc2 = ps->count + (int64_t)pc_new[r] * wc;
                    ps->count = nc2;
                    if (!heap_push(&heap, nc2,
                                   (int32_t)(pk_new[r] >> 32),
                                   (int32_t)(uint32_t)pk_new[r])) { produced = -1; goto done2; }
                    if (ps->where.len == 0 ||
                        ps->where.v[ps->where.len - 1] != (int32_t)w)
                        if (!vec_push(&ps->where, (int32_t)w)) { produced = -1; goto done2; }
                }
            }
        }
        /* counts.pop((l,r)) / where.pop((l,r)) */
        s = map_find(&map, key, 0);
        if (s) {
            s->count = 0;
            free(s->where.v);
            s->where.v = NULL; s->where.len = s->where.cap = 0;
        }
    }

done2:
    free(pk_old); free(pc_old); free(pk_new); free(pc_new);
done:
    if (map.slots) {
        for (uint64_t j = 0; j < map.cap; j++)
            if (map.slots[j].used) free(map.slots[j].where.v);
        free(map.slots);
    }
    free(heap.v);
    free(wbuf); free(wp); free(wlen);
    if (g_syms) {
        /* merged symbols (id >= n_syms0) own their bytes */
        for (int64_t s2 = n_syms0; s2 < g_nsyms; s2++)
            free((void *)g_syms[s2].p);
        free(g_syms);
    }
    free(in.slots);
    return produced;
}
