"""Multimodal media tier: real pure-Python codecs for the formats
that need no external library (PNG via stdlib zlib, uncompressed BMP,
WAV PCM, y4m raw video), native header-parse expressions for the
metadata path, and perceptual hashing over decoded pixels.

The codec seams in operators/multimodal.py (`decode_image` /
`decode_audio` / `decode_video`) dispatch here; only formats that
genuinely require a native library (JPEG entropy decode, MP4/H.264)
remain behind NotImplementedError stubs.
"""
