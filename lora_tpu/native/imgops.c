/* _lora_imgops — native image preprocessing for the training data loader.
 *
 * The reference delegates its input pipeline to torchvision's C++ kernels
 * (dataset.py image_transforms). This module is the TPU-framework
 * equivalent: one fused pass doing bilinear resize (short side -> size),
 * center crop, and normalization to float32 in [-1, 1], parallelized over
 * rows with pthreads. Python falls back to the PIL path when the extension
 * isn't built (lora_tpu/data/dataset.py).
 *
 * Exposed: resize_crop_normalize(src: bytes/buffer (H, W, C) uint8,
 *                                h, w, c, out_size) -> bytes (float32
 *                                out_size*out_size*c, HWC, [-1, 1])
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <math.h>
#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    const uint8_t *src;
    float *dst;
    long src_h, src_w, c;
    long rs_h, rs_w;      /* resized dims before crop */
    long out;             /* crop size */
    long top, left;       /* crop offset in resized space */
    double sy, sx;        /* resize scale factors src/resized */
    long row_begin, row_end;
} job_t;

static void *worker(void *arg) {
    job_t *j = (job_t *)arg;
    const long c = j->c;
    for (long oy = j->row_begin; oy < j->row_end; ++oy) {
        /* position in resized image space, then back-projected to source
         * (PIL-convention half-pixel centers) */
        double fy = ((double)(oy + j->top) + 0.5) * j->sy - 0.5;
        long y0 = (long)floor(fy);
        double wy = fy - (double)y0;
        long y0c = y0 < 0 ? 0 : (y0 >= j->src_h ? j->src_h - 1 : y0);
        long y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= j->src_h ? j->src_h - 1 : y0 + 1);
        const uint8_t *r0 = j->src + y0c * j->src_w * c;
        const uint8_t *r1 = j->src + y1c * j->src_w * c;
        float *out_row = j->dst + oy * j->out * c;
        for (long ox = 0; ox < j->out; ++ox) {
            double fx = ((double)(ox + j->left) + 0.5) * j->sx - 0.5;
            long x0 = (long)floor(fx);
            double wx = fx - (double)x0;
            long x0c = x0 < 0 ? 0 : (x0 >= j->src_w ? j->src_w - 1 : x0);
            long x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= j->src_w ? j->src_w - 1 : x0 + 1);
            for (long ch = 0; ch < c; ++ch) {
                double top = (double)r0[x0c * c + ch] * (1.0 - wx)
                           + (double)r0[x1c * c + ch] * wx;
                double bot = (double)r1[x0c * c + ch] * (1.0 - wx)
                           + (double)r1[x1c * c + ch] * wx;
                double v = top * (1.0 - wy) + bot * wy;
                out_row[ox * c + ch] = (float)(v / 127.5 - 1.0);
            }
        }
    }
    return NULL;
}

static PyObject *resize_crop_normalize(PyObject *self, PyObject *args) {
    Py_buffer buf;
    long h, w, c, out;
    if (!PyArg_ParseTuple(args, "y*llll", &buf, &h, &w, &c, &out))
        return NULL;
    if ((long)buf.len < h * w * c) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "buffer too small for h*w*c");
        return NULL;
    }
    if (h <= 0 || w <= 0 || c <= 0 || out <= 0) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "bad dimensions");
        return NULL;
    }

    /* resize short side to `out`, keeping aspect */
    long rs_h, rs_w;
    if (w <= h) {
        rs_w = out;
        rs_h = (long)llround((double)h * out / (double)w);
        if (rs_h < out) rs_h = out;
    } else {
        rs_h = out;
        rs_w = (long)llround((double)w * out / (double)h);
        if (rs_w < out) rs_w = out;
    }
    long top = (rs_h - out) / 2;
    long left = (rs_w - out) / 2;

    PyObject *result = PyBytes_FromStringAndSize(NULL,
        (Py_ssize_t)(out * out * c * (long)sizeof(float)));
    if (!result) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    float *dst = (float *)PyBytes_AS_STRING(result);

    const int NT = 8;
    pthread_t threads[NT];
    job_t jobs[NT];
    long chunk = (out + NT - 1) / NT;

    Py_BEGIN_ALLOW_THREADS
    for (int t = 0; t < NT; ++t) {
        jobs[t] = (job_t){
            .src = (const uint8_t *)buf.buf, .dst = dst,
            .src_h = h, .src_w = w, .c = c,
            .rs_h = rs_h, .rs_w = rs_w, .out = out,
            .top = top, .left = left,
            .sy = (double)h / (double)rs_h, .sx = (double)w / (double)rs_w,
            .row_begin = t * chunk,
            .row_end = (t + 1) * chunk < out ? (t + 1) * chunk : out,
        };
        if (jobs[t].row_begin >= jobs[t].row_end) { threads[t] = 0; continue; }
        pthread_create(&threads[t], NULL, worker, &jobs[t]);
    }
    for (int t = 0; t < NT; ++t)
        if (threads[t]) pthread_join(threads[t], NULL);
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&buf);
    return result;
}

static PyMethodDef methods[] = {
    {"resize_crop_normalize", resize_crop_normalize, METH_VARARGS,
     "fused bilinear resize + center crop + [-1,1] normalize"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_lora_imgops", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit__lora_imgops(void) {
    return PyModule_Create(&moduledef);
}
