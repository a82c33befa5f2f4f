from ctdirect_tpu.transcription.docp import DOCP, transcribe
from ctdirect_tpu.transcription.schemes import SCHEMES, get_scheme

__all__ = ["DOCP", "transcribe", "SCHEMES", "get_scheme"]
