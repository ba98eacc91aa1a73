"""Degree-grouped permutation layout + composed LUTs for the fast decoder.

Two ideas turn the message-passing sweep into a handful of dense streaming
ops (this is the TPU-native re-design of the reference's per-edge walks,
/root/reference/src/LDPC_Code_LUT.cpp:259-353 — not a translation of them):

1. **Permutation layout, no scatters.**  Edges live in two static orders:
   VN-grouped (variables sorted by degree, each variable's edges contiguous)
   and CN-grouped (likewise for checks).  Each order is partitioned into
   per-degree *contiguous slices* that reshape to dense (nodes, degree)
   blocks for free.  One iteration is then:
   gather(perm_v2c) -> CN blocks -> gather(perm_c2v) -> VN blocks —
   two (B, E) permutation gathers and elementwise block math.  The
   reference's cn_msg_idx scatter/gather pair (cpp:488-541) disappears.

2. **Composed leave-one-out LUTs.**  A whole degree-d VN tree update —
   including all d leave-one-out evaluations — is precomposed into ONE
   table over the joint input label (d messages + channel), with the d
   4-bit outputs packed into one integer.  A VN update becomes a single
   vector gather from a VMEM-resident table plus shift/mask unpacking,
   instead of d tree walks of 2-input LUT lookups.  Tables are composed
   only while they fit (Nq^d * Nq_Cha entries <= 2^20); high-degree nodes
   fall back to per-op TreeProgram evaluation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..core.tanner import TannerGraph
from .layout import TreeProgram, leave_one_out_idx, tree_program

__all__ = [
    "GroupedLayout",
    "compose_var_loo_table",
    "compose_dec_table",
    "MAX_COMPOSED_ENTRIES",
]

MAX_COMPOSED_ENTRIES = 1 << 20


@dataclass(frozen=True)
class Block:
    degree: int
    node_start: int  # start in grouped node order
    num_nodes: int
    edge_start: int  # start in grouped edge order


class GroupedLayout:
    """Static index arrays for the permutation-form decoder.

    slot_major=True lays each degree block out with the edge-slot axis
    OUTERMOST (block range reshapes to (d, n, B)), so per-slot reductions
    and leave-one-out arrangements are contiguous slices — the layout the
    TPU's (sublane, lane) tiling wants.  slot_major=False keeps (n, d, B)
    node-major order.  The permutations absorb the difference.
    """

    def __init__(self, graph: TannerGraph, slot_major: bool = False):
        g = graph
        self.nvar = g.nvar
        self.nchk = g.nchk
        self.num_edges = g.num_edges
        self.slot_major = slot_major

        def block_edges(edge_idx):
            # edge_idx (n, d): grouped order within the block
            return edge_idx.T.reshape(-1) if slot_major else edge_idx.reshape(-1)

        # --- VN-grouped order -------------------------------------------
        vn_blocks: list[Block] = []
        vn_nodes = []  # natural var ids in grouped order
        vnG_edge_orig = []  # grouped edge position -> original edge id
        npos = epos = 0
        for d in g.vn_degrees:
            d = int(d)
            nodes = g.vn_node_idx[d]
            vn_blocks.append(Block(d, npos, len(nodes), epos))
            vn_nodes.append(nodes)
            vnG_edge_orig.append(block_edges(g.vn_edge_idx[d]))
            npos += len(nodes)
            epos += nodes.size * d
        self.vn_blocks = vn_blocks
        self.vn_nodes = np.concatenate(vn_nodes)  # (nvar,)
        vnG_edge_orig = np.concatenate(vnG_edge_orig)  # (E,)

        # position of variable v in grouped node order
        self.vn_node_pos = np.empty(g.nvar, dtype=np.int32)
        self.vn_node_pos[self.vn_nodes] = np.arange(g.nvar, dtype=np.int32)

        # --- CN-grouped order -------------------------------------------
        cn_blocks: list[Block] = []
        cnG_edge_orig = []
        cn_var_natural = []  # variable id of each cn-grouped edge
        npos = epos = 0
        for d in g.cn_degrees:
            d = int(d)
            nodes = g.cn_node_idx[d]
            cn_blocks.append(Block(d, npos, len(nodes), epos))
            cnG_edge_orig.append(block_edges(g.cn_edge_idx[d]))
            cn_var_natural.append(
                g.cn_var_idx[d].T.reshape(-1) if slot_major
                else g.cn_var_idx[d].reshape(-1)
            )
            npos += len(nodes)
            epos += nodes.size * d
        self.cn_blocks = cn_blocks
        cnG_edge_orig = np.concatenate(cnG_edge_orig)

        # --- permutations ------------------------------------------------
        inv_vnG = np.empty(g.num_edges, dtype=np.int64)
        inv_vnG[vnG_edge_orig] = np.arange(g.num_edges)
        inv_cnG = np.empty(g.num_edges, dtype=np.int64)
        inv_cnG[cnG_edge_orig] = np.arange(g.num_edges)
        # cn-grouped position -> vn-grouped position of the same edge
        self.perm_v2c = inv_vnG[cnG_edge_orig].astype(np.int32)
        # vn-grouped position -> cn-grouped position
        self.perm_c2v = inv_cnG[vnG_edge_orig].astype(np.int32)

        # grouped-bit-vector positions of each cn-grouped edge's variable
        # (for the final syndrome check on decision bits)
        self.cn_var_pos = self.vn_node_pos[np.concatenate(cn_var_natural)].astype(
            np.int32
        )


def _mixed_radix_digits(n: int, radices: list[int]) -> np.ndarray:
    """(n, len(radices)) digit table, radix 0 least significant."""
    idx = np.arange(n, dtype=np.int64)
    out = np.empty((n, len(radices)), dtype=np.int32)
    for j, r in enumerate(radices):
        out[:, j] = idx % r
        idx //= r
    return out


def composed_entries(d: int, Nq_msg: int, Nq_cha: int) -> int:
    return Nq_msg**d * Nq_cha


def compose_var_loo_table(
    prog: TreeProgram, d: int, Nq_msg: int, Nq_cha: int, out_bits: int
) -> np.ndarray:
    """Packed leave-one-out table for a degree-d VN tree.

    Entry at joint label (m_0 + Nq*m_1 + ... + Nq^{d-1}*m_{d-1} +
    Nq^d*cha) packs the d leave-one-out outputs, output i in bits
    [i*out_bits, (i+1)*out_bits).  dtype int32 (callers may narrow)."""
    if d * out_bits > 31:
        raise ValueError("compose_var_loo_table: packed width exceeds int32")
    n = composed_entries(d, Nq_msg, Nq_cha)
    inputs = _mixed_radix_digits(n, [Nq_msg] * d + [Nq_cha])
    loo = leave_one_out_idx(d + 1, d)
    packed = np.zeros(n, dtype=np.int64)
    for i in range(d):
        out = prog.eval_np(inputs[:, loo[i]]).astype(np.int64)
        packed |= out << (i * out_bits)
    return packed.astype(np.int32)


def compose_dec_table(prog: TreeProgram, d: int, Nq_msg: int, Nq_cha: int) -> np.ndarray:
    """Hard-decision table for a degree-d decision tree: entry = output
    label (resolution 2) at joint label (d messages + channel)."""
    n = composed_entries(d, Nq_msg, Nq_cha)
    inputs = _mixed_radix_digits(n, [Nq_msg] * d + [Nq_cha])
    return prog.eval_np(inputs).astype(np.int32)


def var_tree_tables(tree, d: int, Nq_msg: int, Nq_cha: int, Nq_out: int):
    """Either ('composed', packed table) or ('program', (prog, tables))."""
    prog = tree_program(tree)
    out_bits = max(1, int(np.ceil(np.log2(Nq_out))))
    if (
        composed_entries(d, Nq_msg, Nq_cha) <= MAX_COMPOSED_ENTRIES
        and d * out_bits <= 31
    ):
        return "composed", compose_var_loo_table(prog, d, Nq_msg, Nq_cha, out_bits)
    return "program", prog
