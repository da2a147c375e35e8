/*
 * Shared helpers for the native alignment parsers (_fasta /
 * _stockholm): whole-file slurp and the strict input guard.
 *
 * Contract: these parsers are FAST PATHS with a Python fallback — on
 * ValueError the caller re-parses with the (universal-newline,
 * UTF-8-decoding) Python reader. Any input whose bytes the C
 * tokenizers would interpret differently from Python MUST therefore
 * raise instead of succeeding with a different answer. ascii_clean()
 * enforces that up front: bare '\r' (not part of "\r\n"), the
 * whitespace bytes Python's str.split()/rstrip() treat as separators
 * but the space/tab-only tokenizers here do not ('\f', '\v'), and any
 * non-ASCII byte (the Python path decodes UTF-8; byte-per-byte
 * widening would mojibake residues and change L) all divert to the
 * Python reader.
 */

#ifndef EVC_NATIVE_IO_COMMON_H
#define EVC_NATIVE_IO_COMMON_H

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <errno.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/types.h>

/* Read a whole file into a NUL-terminated malloc'd buffer.
 * On success returns the buffer and stores its length; on failure
 * sets a Python exception and returns NULL. */
static char *
evc_slurp_file(const char *path, long *size_out)
{
    FILE *fp = fopen(path, "rb");
    if (fp == NULL) {
        PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
        return NULL;
    }
    /* fseeko/ftello: off_t stays 64-bit where long may be 32
     * (production alignments reach gigabytes); errno is captured
     * BEFORE fclose, which may clobber it */
    if (fseeko(fp, 0, SEEK_END) != 0) {
        int saved = errno;
        fclose(fp);
        errno = saved;
        PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
        return NULL;
    }
    off_t fsize_off = ftello(fp);
    if (fsize_off < 0) {
        int saved = errno;
        fclose(fp);
        errno = saved;
        PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
        return NULL;
    }
    if ((unsigned long long)fsize_off
            > (unsigned long long)PY_SSIZE_T_MAX) {
        fclose(fp);
        PyErr_SetString(PyExc_OSError, "file too large");
        return NULL;
    }
    long fsize = (long)fsize_off;
    rewind(fp);

    char *buf = (char *)malloc((size_t)fsize + 1);
    if (buf == NULL) {
        fclose(fp);
        PyErr_NoMemory();
        return NULL;
    }
    if (fsize > 0 && fread(buf, 1, (size_t)fsize, fp) != (size_t)fsize) {
        free(buf);
        fclose(fp);
        PyErr_SetString(PyExc_OSError, "short read");
        return NULL;
    }
    fclose(fp);
    buf[fsize] = '\0';
    *size_out = fsize;
    return buf;
}

/* Verify the buffer contains only bytes both tokenizers agree on
 * (see header comment). Returns 1 if clean; otherwise sets ValueError
 * (diverting the caller to the Python reader) and returns 0. */
static int
evc_ascii_clean(const char *buf, size_t n)
{
    const unsigned char *p = (const unsigned char *)buf;
    for (size_t i = 0; i < n; i++) {
        unsigned char c = p[i];
        if (c >= 0x80) {
            PyErr_SetString(
                PyExc_ValueError,
                "non-ASCII byte: needs the UTF-8-decoding Python "
                "reader");
            return 0;
        }
        if (c == '\r') {
            if (i + 1 >= n || p[i + 1] != '\n') {
                PyErr_SetString(
                    PyExc_ValueError,
                    "bare '\\r' line ending: needs the "
                    "universal-newline Python reader");
                return 0;
            }
            i++;  /* part of CRLF: fine */
        } else if (c == '\f' || c == '\v'
                   || (c >= 0x1c && c <= 0x1e) || c == 0x1f) {
            /* \x1c-\x1f (FS/GS/RS/US) are whitespace to Python's
             * str.split()/rstrip() too */
            PyErr_SetString(
                PyExc_ValueError,
                "whitespace control byte: Python's str.split() "
                "treats it as a separator, this tokenizer does not");
            return 0;
        }
    }
    return 1;
}

#endif /* EVC_NATIVE_IO_COMMON_H */
