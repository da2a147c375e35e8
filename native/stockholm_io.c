/*
 * _stockholm: native single-pass Stockholm loader.
 *
 * Stockholm is the output format of jackhmmer/hmmsearch; production
 * alignments reach gigabytes with sequences interleaved across blocks
 * (the same id re-appears once per block and its residue chunks must
 * be concatenated). The reference accumulates those chunks in Python
 * dict-of-str += loops (reference evcouplings/align/alignment.py:
 * 122-233, read_stockholm). This module does the sequence pass in C:
 *
 *   parse_stockholm(path) ->
 *       (ids: list[str], seqs: bytes, N, L, markup: list[str])
 *
 * - ids in first-appearance order; seqs is the concatenated (N, L)
 *   residue block as one contiguous buffer.
 * - markup collects the raw "#..." annotation lines (rstripped) for
 *   the Python wrapper to parse into GF/GC/GS/GR structures — markup
 *   volume is tiny next to residue volume, the interleaved residue
 *   concatenation is the hot loop.
 * - Only the first alignment of the file is parsed (the framework's
 *   from_file semantics); parsing stops at the "//" terminator.
 *
 * Raises ValueError for: missing "# STOCKHOLM 1.0" header, missing
 * "//" terminator (truncated file), or ragged sequence lengths.
 * Callers fall back to the Python reader on ValueError.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#include "io_common.h"

/* ------------------------------------------------------------------ */
/* open-addressing string hash map: id -> sequence slot               */

typedef struct {
    const char *key;
    Py_ssize_t keylen;
    Py_ssize_t slot;
} HashEntry;

typedef struct {
    HashEntry *entries;
    size_t capacity;   /* power of two */
    size_t size;
} HashMap;

static uint64_t
hash_bytes(const char *s, Py_ssize_t n)
{
    uint64_t h = 1469598103934665603ULL;   /* FNV-1a */
    for (Py_ssize_t i = 0; i < n; i++) {
        h ^= (unsigned char)s[i];
        h *= 1099511628211ULL;
    }
    return h;
}

static int
map_init(HashMap *m, size_t capacity)
{
    m->capacity = capacity;
    m->size = 0;
    m->entries = (HashEntry *)calloc(capacity, sizeof(HashEntry));
    return m->entries != NULL;
}

static int
map_grow(HashMap *m)
{
    size_t new_cap = m->capacity * 2;
    HashEntry *ne = (HashEntry *)calloc(new_cap, sizeof(HashEntry));
    if (ne == NULL) {
        return 0;
    }
    for (size_t i = 0; i < m->capacity; i++) {
        HashEntry *e = &m->entries[i];
        if (e->key == NULL) {
            continue;
        }
        size_t j = hash_bytes(e->key, e->keylen) & (new_cap - 1);
        while (ne[j].key != NULL) {
            j = (j + 1) & (new_cap - 1);
        }
        ne[j] = *e;
    }
    free(m->entries);
    m->entries = ne;
    m->capacity = new_cap;
    return 1;
}

/* returns slot for key; assigns next_slot for new keys (and sets
 * *is_new); -1 on allocation failure */
static Py_ssize_t
map_get_or_add(HashMap *m, const char *key, Py_ssize_t keylen,
               Py_ssize_t next_slot, int *is_new)
{
    if (m->size * 2 >= m->capacity && !map_grow(m)) {
        return -1;
    }
    size_t j = hash_bytes(key, keylen) & (m->capacity - 1);
    while (m->entries[j].key != NULL) {
        HashEntry *e = &m->entries[j];
        if (e->keylen == keylen && memcmp(e->key, key, keylen) == 0) {
            *is_new = 0;
            return e->slot;
        }
        j = (j + 1) & (m->capacity - 1);
    }
    m->entries[j].key = key;
    m->entries[j].keylen = keylen;
    m->entries[j].slot = next_slot;
    m->size++;
    *is_new = 1;
    return next_slot;
}

/* ------------------------------------------------------------------ */

typedef struct {
    const char *id;
    Py_ssize_t idlen;
    char *seq;          /* growable residue buffer */
    Py_ssize_t len;
    Py_ssize_t cap;
} SeqSlot;

static const char STOCKHOLM_HEADER[] = "# STOCKHOLM 1.0";

static PyObject *
parse_stockholm(PyObject *self, PyObject *args)
{
    const char *path;
    if (!PyArg_ParseTuple(args, "s", &path)) {
        return NULL;
    }

    long fsize = 0;
    char *buf = evc_slurp_file(path, &fsize);
    if (buf == NULL) {
        return NULL;
    }

    /* strict input guard — see io_common.h: inputs the Python reader
     * would tokenize differently must raise, not silently diverge */
    if (!evc_ascii_clean(buf, (size_t)fsize)) {
        free(buf);
        return NULL;
    }

    SeqSlot *slots = NULL;
    Py_ssize_t n_slots = 0, cap_slots = 0;
    HashMap map;
    PyObject *markup = NULL, *ids = NULL, *seqs_bytes = NULL;
    PyObject *result = NULL;
    int saw_terminator = 0;

    if (!map_init(&map, 1024)) {
        free(buf);
        return PyErr_NoMemory();
    }

    markup = PyList_New(0);
    if (markup == NULL) {
        goto done;
    }

    char *p = buf;
    char *end = buf + fsize;
    int first_line = 1;

    while (p < end) {
        char *eol = memchr(p, '\n', (size_t)(end - p));
        char *line_end = eol ? eol : end;
        /* rstrip */
        while (line_end > p &&
               (line_end[-1] == '\r' || line_end[-1] == ' ' ||
                line_end[-1] == '\t')) {
            line_end--;
        }
        Py_ssize_t linelen = line_end - p;

        if (first_line) {
            if (linelen < (Py_ssize_t)(sizeof(STOCKHOLM_HEADER) - 1) ||
                memcmp(p, STOCKHOLM_HEADER,
                       sizeof(STOCKHOLM_HEADER) - 1) != 0) {
                PyErr_SetString(
                    PyExc_ValueError,
                    "Not a valid Stockholm alignment: Header missing."
                );
                goto done;
            }
            first_line = 0;
        } else if (linelen >= 2 && p[0] == '/' && p[1] == '/') {
            saw_terminator = 1;
            break;
        } else if (linelen > 0 && p[0] == '#') {
            PyObject *s = PyUnicode_FromStringAndSize(p, linelen);
            if (s == NULL || PyList_Append(markup, s) < 0) {
                Py_XDECREF(s);
                goto done;
            }
            Py_DECREF(s);
        } else if (linelen > 0) {
            /* "id  residues" — split like Python's str.split(),
             * which also skips LEADING whitespace */
            char *id_start = p;
            while (id_start < line_end
                   && (*id_start == ' ' || *id_start == '\t')) {
                id_start++;
            }
            char *sp = id_start;
            while (sp < line_end && *sp != ' ' && *sp != '\t') {
                sp++;
            }
            char *res = sp;
            while (res < line_end && (*res == ' ' || *res == '\t')) {
                res++;
            }
            if (sp == id_start || res == line_end) {
                /* no id/residues split: ignore like the Python
                 * reader (len(splitted) != 2) */
                goto next_line;
            }
            /* interior whitespace in the residue field would make the
             * Python reader's split yield three fields -> ignored */
            for (char *q = res; q < line_end; q++) {
                if (*q == ' ' || *q == '\t') {
                    goto next_line;
                }
            }

            int is_new = 0;
            Py_ssize_t slot = map_get_or_add(
                &map, id_start, sp - id_start, n_slots, &is_new
            );
            if (slot < 0) {
                PyErr_NoMemory();
                goto done;
            }
            if (is_new) {
                if (n_slots == cap_slots) {
                    Py_ssize_t nc = cap_slots ? cap_slots * 2 : 1024;
                    SeqSlot *ns = (SeqSlot *)realloc(
                        slots, (size_t)nc * sizeof(SeqSlot)
                    );
                    if (ns == NULL) {
                        PyErr_NoMemory();
                        goto done;
                    }
                    slots = ns;
                    cap_slots = nc;
                }
                slots[n_slots].id = id_start;
                slots[n_slots].idlen = sp - id_start;
                slots[n_slots].seq = NULL;
                slots[n_slots].len = 0;
                slots[n_slots].cap = 0;
                n_slots++;
            }

            SeqSlot *s = &slots[slot];
            Py_ssize_t chunk = line_end - res;
            if (s->len + chunk > s->cap) {
                Py_ssize_t nc = s->cap ? s->cap * 2 : chunk * 2;
                if (nc < s->len + chunk) {
                    nc = s->len + chunk;
                }
                char *nb = (char *)realloc(s->seq, (size_t)nc);
                if (nb == NULL) {
                    PyErr_NoMemory();
                    goto done;
                }
                s->seq = nb;
                s->cap = nc;
            }
            memcpy(s->seq + s->len, res, (size_t)chunk);
            s->len += chunk;
        }

    next_line:
        p = eol ? eol + 1 : end;
    }

    if (!saw_terminator) {
        /* truncated alignment: reference yields nothing */
        PyErr_SetString(
            PyExc_ValueError,
            "Truncated Stockholm alignment (missing // terminator)."
        );
        goto done;
    }
    if (n_slots == 0) {
        PyErr_SetString(
            PyExc_ValueError, "Stockholm alignment contains no sequences."
        );
        goto done;
    }

    Py_ssize_t L = slots[0].len;
    for (Py_ssize_t i = 1; i < n_slots; i++) {
        if (slots[i].len != L) {
            PyErr_SetString(
                PyExc_ValueError, "Stockholm rows have unequal lengths."
            );
            goto done;
        }
    }

    ids = PyList_New(n_slots);
    if (ids == NULL) {
        goto done;
    }
    seqs_bytes = PyBytes_FromStringAndSize(NULL, n_slots * L);
    if (seqs_bytes == NULL) {
        goto done;
    }
    char *out = PyBytes_AS_STRING(seqs_bytes);
    for (Py_ssize_t i = 0; i < n_slots; i++) {
        PyObject *id_str = PyUnicode_FromStringAndSize(
            slots[i].id, slots[i].idlen
        );
        if (id_str == NULL) {
            goto done;
        }
        PyList_SET_ITEM(ids, i, id_str);   /* steals reference */
        memcpy(out + i * L, slots[i].seq, (size_t)L);
    }

    result = Py_BuildValue(
        "(OOnnO)", ids, seqs_bytes, (Py_ssize_t)n_slots, L, markup
    );

done:
    if (slots != NULL) {
        for (Py_ssize_t i = 0; i < n_slots; i++) {
            free(slots[i].seq);
        }
        free(slots);
    }
    free(map.entries);
    free(buf);
    Py_XDECREF(ids);
    Py_XDECREF(seqs_bytes);
    Py_XDECREF(markup);
    return result;
}

static PyMethodDef StockholmMethods[] = {
    {"parse_stockholm", parse_stockholm, METH_VARARGS,
     "parse_stockholm(path) -> (ids, seqs, N, L, markup)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef stockholm_module = {
    PyModuleDef_HEAD_INIT, "_stockholm",
    "Native single-pass Stockholm alignment parser.", -1,
    StockholmMethods,
};

PyMODINIT_FUNC
PyInit__stockholm(void)
{
    return PyModule_Create(&stockholm_module);
}
