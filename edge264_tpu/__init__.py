"""edge264_tpu — TPU-native H.264/AVC decoder (JAX/XLA/Pallas).

Public API mirrors the 7 entry points of the reference decoder
(reference: edge264.h:64-70): alloc/flush/free are the Decoder lifecycle,
decode_nal/get_frame/return_frame the streaming loop, find_start_code the
Annex-B scanner.
"""

from .api import Decoder, Frame, find_start_code, decode_annexb  # noqa: F401

__version__ = "0.1.0"
