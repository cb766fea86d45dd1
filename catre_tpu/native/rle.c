/* _catre_rle: fast run-length-encoded mask codec for the host data loader.
 *
 * The reference relies on pycocotools' C backend for RLE masks
 * (lib/utils/mask_utils.py: cocosegm2mask / binary_mask_to_rle); this module
 * provides the same three operations standalone:
 *   decode_uncompressed(counts: sequence[int], h, w) -> bytes (h*w, col-major)
 *   encode(mask: bytes, h, w) -> list[int] counts (col-major, zero-run first)
 *   decode_coco_string(s: bytes, h, w) -> bytes (h*w, col-major)
 * The COCO compressed string format is 5-bit groups with a continuation bit
 * (0x20), sign extension (0x10), delta-coded from the 3rd count on.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

static PyObject *
rle_decode_uncompressed(PyObject *self, PyObject *args)
{
    PyObject *counts_obj;
    Py_ssize_t h, w;
    if (!PyArg_ParseTuple(args, "Onn", &counts_obj, &h, &w))
        return NULL;

    PyObject *seq = PySequence_Fast(counts_obj, "counts must be a sequence");
    if (!seq)
        return NULL;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
    Py_ssize_t total = h * w;

    PyObject *out = PyBytes_FromStringAndSize(NULL, total);
    if (!out) {
        Py_DECREF(seq);
        return NULL;
    }
    uint8_t *buf = (uint8_t *)PyBytes_AS_STRING(out);
    memset(buf, 0, (size_t)total);

    Py_ssize_t pos = 0;
    uint8_t val = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        long c = PyLong_AsLong(PySequence_Fast_GET_ITEM(seq, i));
        if (c < 0 && PyErr_Occurred()) {
            Py_DECREF(seq);
            Py_DECREF(out);
            return NULL;
        }
        if (pos + c > total)
            c = total - pos;
        if (val)
            memset(buf + pos, 1, (size_t)c);
        pos += c;
        val = !val;
        if (pos >= total)
            break;
    }
    Py_DECREF(seq);
    return out;
}

static PyObject *
rle_encode(PyObject *self, PyObject *args)
{
    Py_buffer mask;
    Py_ssize_t h, w;
    if (!PyArg_ParseTuple(args, "y*nn", &mask, &h, &w))
        return NULL;
    if (mask.len != h * w) {
        PyBuffer_Release(&mask);
        PyErr_SetString(PyExc_ValueError, "mask length != h*w");
        return NULL;
    }
    const uint8_t *buf = (const uint8_t *)mask.buf;
    Py_ssize_t total = h * w;

    PyObject *counts = PyList_New(0);
    if (!counts) {
        PyBuffer_Release(&mask);
        return NULL;
    }
    uint8_t prev = 0;
    Py_ssize_t run = 0;
    for (Py_ssize_t i = 0; i < total; i++) {
        uint8_t v = buf[i] ? 1 : 0;
        if (v == prev) {
            run++;
        } else {
            PyObject *num = PyLong_FromSsize_t(run);
            if (!num || PyList_Append(counts, num) < 0) {
                Py_XDECREF(num);
                Py_DECREF(counts);
                PyBuffer_Release(&mask);
                return NULL;
            }
            Py_DECREF(num);
            prev = v;
            run = 1;
        }
    }
    PyObject *num = PyLong_FromSsize_t(run);
    if (!num || PyList_Append(counts, num) < 0) {
        Py_XDECREF(num);
        Py_DECREF(counts);
        PyBuffer_Release(&mask);
        return NULL;
    }
    Py_DECREF(num);
    PyBuffer_Release(&mask);
    return counts;
}

static PyObject *
rle_decode_coco_string(PyObject *self, PyObject *args)
{
    Py_buffer sbuf;
    Py_ssize_t h, w;
    if (!PyArg_ParseTuple(args, "y*nn", &sbuf, &h, &w))
        return NULL;
    const uint8_t *s = (const uint8_t *)sbuf.buf;
    Py_ssize_t slen = sbuf.len;
    Py_ssize_t total = h * w;

    PyObject *out = PyBytes_FromStringAndSize(NULL, total);
    if (!out) {
        PyBuffer_Release(&sbuf);
        return NULL;
    }
    uint8_t *buf = (uint8_t *)PyBytes_AS_STRING(out);
    memset(buf, 0, (size_t)total);

    /* decode counts then fill runs */
    Py_ssize_t pos = 0;
    uint8_t val = 0;
    long prev2 = 0, prev1 = 0; /* counts[m-2], counts[m-1] */
    Py_ssize_t m = 0;
    Py_ssize_t p = 0;
    while (p < slen) {
        long x = 0;
        int k = 0, more = 1;
        while (more) {
            if (p >= slen) {
                more = 0;
                break;
            }
            long c = (long)s[p] - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (int)(c & 0x20);
            p++;
            k++;
            if (!more && (c & 0x10))
                x |= -1L << (5 * k);
        }
        if (m > 2) /* delta-coded from the 4th count on (pycocotools) */
            x += prev2;
        prev2 = prev1;
        prev1 = x;
        m++;

        long c = x;
        if (c < 0)
            c = 0;
        if (pos + c > total)
            c = total - pos;
        if (val)
            memset(buf + pos, 1, (size_t)c);
        pos += c;
        val = !val;
        if (pos >= total)
            break;
    }
    PyBuffer_Release(&sbuf);
    return out;
}

static PyMethodDef RleMethods[] = {
    {"decode_uncompressed", rle_decode_uncompressed, METH_VARARGS,
     "decode uncompressed RLE counts to a column-major uint8 mask"},
    {"encode", rle_encode, METH_VARARGS,
     "encode a column-major uint8 mask to RLE counts"},
    {"decode_coco_string", rle_decode_coco_string, METH_VARARGS,
     "decode a COCO compressed RLE byte string to a column-major uint8 mask"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef rlemodule = {
    PyModuleDef_HEAD_INIT, "_catre_rle", "fast RLE mask codec", -1, RleMethods,
};

PyMODINIT_FUNC
PyInit__catre_rle(void)
{
    return PyModule_Create(&rlemodule);
}
