"""profile_table attribution: HLO-dump parsing + module-tree math
(the xplane side needs a real trace; covered by the on-chip tool run
recorded in docs/performance.md)."""
import io
import os

from tools.profile_table import (Node, best_dump_for, build_tree,
                                 load_op_names, print_tree)

HLO = """HloModule jit_fn, is_scheduled=true, entry_computation_layout=x
  %fusion.1 = f32[8]{0} fusion(), kind=kLoop, metadata={op_name="jit(fn)/while/body/attn/dot_general" source_file="a.py"}
  %fusion.2 = f32[8]{0} fusion(), kind=kLoop, metadata={op_name="jit(fn)/while/body/mlp/dot_general"}
  %scatter.3 = f32[8]{0} scatter(), metadata={op_name="jit(fn)/while/body/attn/scatter"}
"""


def test_load_and_attribute(tmp_path):
    p = tmp_path / "decode_0_1.after_optimizations.txt"
    p.write_text(HLO)
    dumps = load_op_names(str(tmp_path))
    key = best_dump_for(["fusion.1", "scatter.3"], dumps)
    assert key == p.name
    table = dumps[key]
    assert table["fusion.1"].endswith("attn/dot_general")
    assert table["scatter.3"].endswith("attn/scatter")


def test_tree_accumulation():
    rows = [("while/body/attn/dot", 6e9), ("while/body/attn/scatter", 2e9),
            ("while/body/mlp/dot", 4e9), ("sample/topk", 1e9)]
    tree = build_tree(rows)
    assert tree.total_ps == 13e9
    wb = tree.children["while"].children["body"]
    assert wb.total_ps == 12e9
    assert wb.children["attn"].total_ps == 8e9
    assert wb.children["attn"].children["dot"].self_ps == 6e9
    buf = io.StringIO()
    print_tree(tree, depth=3, top=10, out=buf)
    text = buf.getvalue()
    assert "attn" in text and "TOTAL device time" in text
    assert "13.000" in text  # ms total
