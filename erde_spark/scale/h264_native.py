"""Availability-gated H.264/HEVC frame decode via the system
libavcodec — the codec tier behind ``video_frame_hashes`` for real
crawl video (MJPEG decodes through the repo's own JPEG codec;
H.264/H.265 bitstreams are exactly the hand-roll-nothing class this
repo binds system reference implementations for, like
``jpeg_native``/``webp_native``).

libavcodec's public structs (AVFrame/AVPacket) are version-dependent,
so NO ABI is guessed: a small C shim is compiled ONCE per host against
the system ``libavcodec`` headers (the same pattern as the libjpeg
shim) and cached; everything gates behind ``available()``. This
container ships neither libavcodec nor its headers, so here the
documented ``NotImplementedError`` path is the one that runs — the
absent-path behavior is pinned in tests/test_mp4.py, and the shim
activates unchanged on hosts with ``libavcodec-dev`` + gcc.

The decode contract is luma-only: perceptual hashing consumes the Y
plane, so the shim never converts color (no swscale dependency).
Samples arrive AVCC-framed (length-prefixed NALs, as stored in MP4
``mdat``); the stsd ``avcC``/``hvcC`` decoder-configuration record is
passed as ``extradata`` exactly as ISO 14496-15 intends.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_SHIM_C = r'''
#include <stdlib.h>
#include <string.h>
#include <libavcodec/avcodec.h>

/* Decode the FIRST complete frame of one AVCC-framed sample and copy
   its luma plane into out (row-major, w*h bytes). codec_id: 27=H264,
   173=HEVC (AV_CODEC_ID_* values are part of the public API). */
int es_h264_decode_luma(const unsigned char* extradata, int extralen,
                        const unsigned char* sample, int samplelen,
                        int codec_id, unsigned char* out, long out_cap,
                        int* w, int* h) {
  const AVCodec* codec = avcodec_find_decoder((enum AVCodecID)codec_id);
  if (!codec) return -1;
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  if (!ctx) return -2;
  int rc = -3;
  AVPacket* pkt = NULL; AVFrame* frame = NULL;
  if (extradata && extralen > 0) {
    ctx->extradata = (uint8_t*)av_mallocz(
        extralen + AV_INPUT_BUFFER_PADDING_SIZE);
    if (!ctx->extradata) goto done;
    memcpy(ctx->extradata, extradata, extralen);
    ctx->extradata_size = extralen;
  }
  if (avcodec_open2(ctx, codec, NULL) < 0) goto done;
  pkt = av_packet_alloc();
  frame = av_frame_alloc();
  if (!pkt || !frame) goto done;
  if (av_new_packet(pkt, samplelen) < 0) goto done;
  memcpy(pkt->data, sample, samplelen);
  if (avcodec_send_packet(ctx, pkt) < 0) goto done;
  if (avcodec_receive_frame(ctx, frame) < 0) {
    /* flush: some streams need a drain for the first frame */
    avcodec_send_packet(ctx, NULL);
    if (avcodec_receive_frame(ctx, frame) < 0) goto done;
  }
  *w = frame->width; *h = frame->height;
  if ((long)frame->width * frame->height > out_cap) { rc = -4; goto done; }
  for (int y = 0; y < frame->height; y++)
    memcpy(out + (size_t)y * frame->width,
           frame->data[0] + (size_t)y * frame->linesize[0],
           frame->width);
  rc = 0;
done:
  if (frame) av_frame_free(&frame);
  if (pkt) av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  return rc;
}
'''

#: AV_CODEC_ID_* values (public libavcodec API constants)
_CODEC_IDS = {'avc1': 27, 'avc3': 27, 'h264': 27,
              'hvc1': 173, 'hev1': 173, 'hevc': 173}

_LIB = None
_ERR: str | None = None


def _shim() -> ctypes.CDLL:
    global _LIB, _ERR
    if _LIB is not None:
        return _LIB
    if _ERR is not None:
        raise OSError(_ERR)
    try:
        d = os.path.join(tempfile.gettempdir(),
                         f'erde_h264_shim_{os.getuid()}')
        os.makedirs(d, exist_ok=True)
        so = os.path.join(d, 'libesh264.so')
        if not os.path.exists(so):
            src = os.path.join(d, 'shim.c')
            with open(src, 'w') as f:
                f.write(_SHIM_C)
            tmp = tempfile.mktemp(suffix='.so', dir=d)
            subprocess.run(
                ['gcc', '-O2', '-shared', '-fPIC', src, '-o', tmp,
                 '-lavcodec', '-lavutil'],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, so)  # atomic: concurrent builders converge
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.es_h264_decode_luma.restype = ctypes.c_int
        lib.es_h264_decode_luma.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.c_int, u8p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    except Exception as ex:  # no gcc / headers / libavcodec
        _ERR = f'libavcodec shim unavailable: {ex}'
        raise OSError(_ERR) from None
    _LIB = lib
    return lib


def available() -> bool:
    """True when the host can build (or has built) the libavcodec shim
    — gcc + libavcodec headers + the library. False in this container
    (it ships no H.264/HEVC codec); the MP4 tier then raises its
    documented NotImplementedError instead of decoding."""
    try:
        _shim()
        return True
    except OSError:
        return False


#: frame cap for the preallocated luma buffer (32 MP)
_MAX_PIXELS = 32 << 20


def decode_video_frame_luma(codec: str, extradata: bytes | None,
                            sample: bytes) -> np.ndarray:
    """One AVCC-framed H.264/HEVC sample -> (h, w) uint8 luma plane.
    ``codec`` is the stsd sample-entry fourcc ('avc1'/'hvc1'/...);
    ``extradata`` the avcC/hvcC decoder-configuration record. Raises
    NotImplementedError when the host lacks libavcodec."""
    codec_id = _CODEC_IDS.get(codec)
    if codec_id is None:
        raise NotImplementedError(f'unsupported video codec {codec!r}')
    try:
        lib = _shim()
    except OSError as ex:
        raise NotImplementedError(
            f'{codec} decode requires the system libavcodec '
            f'(gcc + libavcodec headers); {ex}') from None
    out = np.empty(_MAX_PIXELS, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.es_h264_decode_luma(
        extradata or b'', len(extradata or b''), sample, len(sample),
        codec_id, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.size, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise ValueError(f'libavcodec failed to decode {codec} sample '
                         f'(rc={rc})')
    return out[:h.value * w.value].reshape(h.value, w.value).copy()
