/*
 * _fasta: native single-pass FASTA/A2M loader.
 *
 * The reference framework parses alignments line-by-line in Python
 * (reference evcouplings/align/alignment.py:42-74, read_fasta); for
 * production-scale MSAs (millions of rows) that parse dominates job
 * startup. This module does one pass over the raw file buffer in C and
 * returns the sequence block as a single contiguous bytes object that
 * numpy can view as an (N, L) matrix without further copying.
 *
 * Exported: parse_fasta(path) -> (ids: list[str], seqs: bytes, N, L)
 *
 * Semantics match the Python reader: header lines start with '>'
 * (trailing whitespace stripped), ';' lines are comments, sequence
 * lines are concatenated with trailing '\r'/'\n'/whitespace stripped.
 * Raises ValueError for ragged rows (a3m input — callers fall back to
 * the insert-aware Python parser) and for files without any '>'.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "io_common.h"

static int
is_trailing_ws(unsigned char c)
{
    return c == ' ' || c == '\t' || c == '\r';
}

static PyObject *
parse_fasta(PyObject *self, PyObject *args)
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

    /* strict input guard: any byte the Python reader would interpret
     * differently (bare '\r' incl. CR-only files, \f/\v whitespace,
     * non-ASCII) raises ValueError so the caller falls back — the
     * fast path must never silently produce a different alignment */
    if (!evc_ascii_clean(buf, (size_t)fsize)) {
        free(buf);
        return NULL;
    }

    /* sequence bytes can never exceed the file size */
    char *seqbuf = (char *)malloc((size_t)fsize + 1);
    if (seqbuf == NULL) {
        free(buf);
        return PyErr_NoMemory();
    }

    PyObject *ids = PyList_New(0);
    if (ids == NULL) {
        free(buf);
        free(seqbuf);
        return NULL;
    }

    Py_ssize_t seq_len = 0;       /* total bytes written to seqbuf */
    Py_ssize_t row_start = 0;     /* start of current row in seqbuf */
    Py_ssize_t L = -1;            /* row length, fixed by first row */
    Py_ssize_t n_rows = 0;
    int in_record = 0;

    char *p = buf;
    char *end = buf + fsize;

    while (p < end) {
        /* find end of this line */
        char *nl = memchr(p, '\n', (size_t)(end - p));
        char *line_end = (nl != NULL) ? nl : end;

        if (*p == '>') {
            /* close previous record */
            if (in_record) {
                Py_ssize_t row_len = seq_len - row_start;
                if (L < 0) {
                    L = row_len;
                } else if (row_len != L) {
                    PyErr_Format(
                        PyExc_ValueError,
                        "Unequal sequence lengths: %zd != %zd (row %zd)",
                        row_len, L, n_rows);
                    goto fail;
                }
                n_rows++;
            }
            in_record = 1;
            row_start = seq_len;

            /* header: strip trailing whitespace, drop '>' */
            char *h_end = line_end;
            while (h_end > p + 1 && is_trailing_ws((unsigned char)h_end[-1]))
                h_end--;
            /* pure ASCII after evc_ascii_clean: strict cannot fail */
            PyObject *id = PyUnicode_DecodeUTF8(
                p + 1, (Py_ssize_t)(h_end - (p + 1)), "strict");
            if (id == NULL || PyList_Append(ids, id) != 0) {
                Py_XDECREF(id);
                goto fail;
            }
            Py_DECREF(id);
        } else if (*p != ';' && in_record) {
            /* sequence line: copy, stripping trailing whitespace */
            char *s_end = line_end;
            while (s_end > p && is_trailing_ws((unsigned char)s_end[-1]))
                s_end--;
            size_t n = (size_t)(s_end - p);
            memcpy(seqbuf + seq_len, p, n);
            seq_len += (Py_ssize_t)n;
        }

        p = (nl != NULL) ? nl + 1 : end;
    }

    if (!in_record) {
        PyErr_SetString(PyExc_ValueError,
                        "No FASTA records found (no '>' header)");
        goto fail;
    }

    /* close last record */
    {
        Py_ssize_t row_len = seq_len - row_start;
        if (L < 0) {
            L = row_len;
        } else if (row_len != L) {
            PyErr_Format(
                PyExc_ValueError,
                "Unequal sequence lengths: %zd != %zd (row %zd)",
                row_len, L, n_rows);
            goto fail;
        }
        n_rows++;
    }

    free(buf);
    buf = NULL;

    PyObject *seqs = PyBytes_FromStringAndSize(seqbuf, seq_len);
    free(seqbuf);
    if (seqs == NULL) {
        Py_DECREF(ids);
        return NULL;
    }

    PyObject *result = Py_BuildValue("(NNnn)", ids, seqs, n_rows, L);
    if (result == NULL) {
        /* 'N' arguments are consumed by Py_BuildValue even on error
         * (CPython do_mktuple releases them on the failure path since
         * 3.5.2 / bpo-26168) — decref'ing here would double-free */
        return NULL;
    }
    return result;

fail:
    free(buf);
    free(seqbuf);
    Py_DECREF(ids);
    return NULL;
}

static PyMethodDef FastaMethods[] = {
    {"parse_fasta", parse_fasta, METH_VARARGS,
     "parse_fasta(path) -> (ids, seq_bytes, n_rows, row_length)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef fastamodule = {
    PyModuleDef_HEAD_INIT,
    "_fasta",
    "Native single-pass FASTA/A2M alignment loader.",
    -1,
    FastaMethods,
};

PyMODINIT_FUNC
PyInit__fasta(void)
{
    return PyModule_Create(&fastamodule);
}
