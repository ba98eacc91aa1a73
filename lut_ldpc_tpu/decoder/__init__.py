from .arith import build_arith_spec
from .arith_decoder import ArithLUTDecoder
from .bp import BPDecoder
from .codec import CONT, QCHA, LUTCodec
from .fast_decoder import FastLUTDecoder, make_decoder
from .staged import StagedLUTDecoder, make_staged_decoder
from .layout import TreeProgram, leave_one_out_idx, tree_program
from .lut_decoder import LUTDecoder, cn_minsum

__all__ = [
    "ArithLUTDecoder",
    "BPDecoder",
    "build_arith_spec",
    "CONT",
    "FastLUTDecoder",
    "StagedLUTDecoder",
    "make_decoder",
    "make_staged_decoder",
    "QCHA",
    "LUTCodec",
    "LUTDecoder",
    "TreeProgram",
    "cn_minsum",
    "leave_one_out_idx",
    "tree_program",
]
