"""Render the reference's example LUT tree: TikZ export + PNG.

The reference ships trees/example.{tikz,pdf,png} for the degree-8
variable-node tree template ``riim/im/m///iim/m//im/m////c//``
(/root/reference/trees/README.md, example.tikz).  This writes the same
two assets from this framework's exporter: ``trees/example.tikz`` via
``LUTTree.tikz_draw`` (core/trees.py, reference style), and
``trees/example.png`` via a small matplotlib layout of the identical
structure (no LaTeX toolchain in this environment; the PNG proves the
structure end-to-end and mirrors the reference's figure).

  python examples/render_tree_example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TEMPLATE = "riim/im/m///iim/m//im/m////c//"


def main():
    from lut_ldpc_tpu.core.trees import LUTTree, VARTREE, ROOT as NROOT, \
        MSG, CHA

    t = LUTTree.from_template(TEMPLATE, VARTREE)
    tikz = t.root.tikz_draw()
    out_tikz = os.path.join(ROOT, "trees", "example.tikz")
    with open(out_tikz, "w") as f:
        f.write(tikz + "\n")
    print(f"wrote {out_tikz} ({len(tikz.splitlines())} lines)")

    # matplotlib rendering: Reingold-Tilford-ish tidy layout
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    nodes = []  # (node, depth, x)

    def leaves(n):
        return 1 if not n.children else sum(leaves(c) for c in n.children)

    def place(n, depth, x0):
        w = leaves(n)
        x = x0 + w / 2.0
        nodes.append((n, depth, x))
        cx = x0
        childs = []
        for c in n.children:
            childs.append(place(c, depth + 1, cx))
            cx += leaves(c)
        return x

    place(t.root, 0, 0.0)
    pos = {id(n): (x, -d) for n, d, x in nodes}
    fig, ax = plt.subplots(figsize=(7, 4))
    for n, d, x in nodes:
        for c in n.children:
            cx, cy = pos[id(c)]
            ax.annotate(
                "", xy=(x, -d - 0.08), xytext=(cx, cy + 0.10),
                arrowprops=dict(arrowstyle="->", lw=0.9, color="0.25"),
            )
    for n, d, x in nodes:
        if n.type == NROOT:
            label, fc = r"$\Phi$", "#c6dbef"
        elif n.type == MSG:
            label, fc = r"$\mu$", "#e5f5e0"
        elif n.type == CHA:
            label, fc = r"$L$", "#fee6ce"
        else:
            label, fc = r"$\Phi$", "#c6dbef"
        ax.text(x, -d, label, ha="center", va="center", fontsize=11,
                bbox=dict(boxstyle="circle,pad=0.25", fc=fc, ec="0.3"))
    ax.set_xlim(-0.5, leaves(t.root) + 0.5)
    ax.set_ylim(-t.root.height() - 0.5, 0.5)
    ax.axis("off")
    ax.set_title(f"Variable-node LUT tree, template {TEMPLATE}",
                 fontsize=9)
    out_png = os.path.join(ROOT, "trees", "example.png")
    fig.savefig(out_png, dpi=150, bbox_inches="tight")
    print(f"wrote {out_png}")
    # vector PDF counterpart of the reference's trees/example.pdf (the
    # tikz source is checked in for users with a LaTeX toolchain; this
    # PDF is the same structure rendered by matplotlib)
    out_pdf = os.path.join(ROOT, "trees", "example.pdf")
    fig.savefig(out_pdf, bbox_inches="tight")
    print(f"wrote {out_pdf}")


if __name__ == "__main__":
    main()
