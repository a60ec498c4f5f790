"""jpegtpu — a TPU-native JPEG baseline encoder framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the reference
OpenCL encoder (``rusty-electron/jpeg-encoder-opencl``; see SURVEY.md):
RGB->YCbCr, chroma subsampling (4:4:4 / reference-style smoothed 4:4:4 / true
4:2:0), mirror padding, level shift, 8x8 DCT, quantization with quality
scaling, zigzag, RLE + Huffman entropy coding — plus the complete JFIF
container the reference lacks (reference stops at Huffman bit-strings,
src/OpenCLProject_JpegEncoder.cpp:225).

Design: the whole pixel path (shift+DCT+quant+zigzag) is folded into a single
fused matrix product on the MXU; entropy coding is restart-interval segmented
and fully vectorized (no per-coefficient Python), packed on device.
"""

from jpegtpu.config import EncoderConfig
from jpegtpu.encoder import encode, encode_batch, Encoder

__version__ = "0.1.0"

__all__ = ["EncoderConfig", "encode", "encode_batch", "Encoder", "__version__"]
