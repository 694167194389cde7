from . import bpe  # noqa: F401
from .bpe import ClipTokenizer  # noqa: F401
