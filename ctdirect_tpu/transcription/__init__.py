from ctdirect_tpu.transcription.docp import DOCP, transcribe
from ctdirect_tpu.transcription.schemes import SCHEMES, get_scheme
from ctdirect_tpu.transcription.strategies import Collocation, DirectShooting, discretize

__all__ = [
    "DOCP",
    "transcribe",
    "SCHEMES",
    "get_scheme",
    "Collocation",
    "DirectShooting",
    "discretize",
]
