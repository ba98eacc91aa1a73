from .bp import BPDecoder
from .codec import CONT, QCHA, LUTCodec
from .layout import TreeProgram, leave_one_out_idx, tree_program
from .lut_decoder import LUTDecoder, cn_minsum

__all__ = [
    "BPDecoder",
    "CONT",
    "QCHA",
    "LUTCodec",
    "LUTDecoder",
    "TreeProgram",
    "cn_minsum",
    "leave_one_out_idx",
    "tree_program",
]
