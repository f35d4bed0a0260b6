"""Layerwise profile attribution (VERDICT r4 #8; reference analogue
vllm/profiler/nm_profile.py:66 + print_table.py): turn a jax.profiler
trace into a module-tree time table.

The TPU plane's "XLA Ops" line gives per-instruction device time but
names like ``fusion.162``; the XLA dump gives each instruction's
``metadata={op_name="jit(fn)/while/body/...attention.../dot_general"}``
source path. Joining the two attributes every picosecond of device time
to the model's module tree, then the tree is printed with self/total
times — the nm_profile table, TPU-native.

Capture (two env vars, any entry point):
    profile:  with jax.profiler.trace(PROF_DIR): ...   (or this tool's
              --capture mode around a tiny offline run)
    HLO dump: XLA_FLAGS="--xla_dump_to=DUMP_DIR" (optimized .txt dumps)

Analyze:
    python tools/profile_table.py --profile-dir PROF_DIR \
        --hlo-dump-dir DUMP_DIR [--depth 4] [--top 40]
"""
import argparse
import collections
import glob
import os
import re
import sys
from typing import Dict, List, Optional, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


# ---------------------------------------------------------------- xplane
def load_xla_ops(profile_dir: str) -> List[Tuple[str, str, float]]:
    """[(instr_name, module_event_name, duration_ps)] from the TPU plane.
    Module identity comes from time containment in the "XLA Modules"
    line."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(
        os.path.join(profile_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(
            f"no *.xplane.pb under {profile_dir} (capture with "
            "jax.profiler.trace)")
    out: List[Tuple[str, str, float]] = []
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "device" not in plane.name:
                continue
            emeta = plane.event_metadata
            smeta = {k: v.name for k, v in plane.stat_metadata.items()}
            modules: List[Tuple[float, float, str]] = []
            ops: List[Tuple[float, float, str]] = []
            for line in plane.lines:
                if line.name not in ("XLA Modules", "XLA Ops"):
                    continue
                for e in line.events:
                    md = emeta[e.metadata_id]
                    dur = offset = 0.0
                    for s in e.stats:
                        key = smeta.get(s.metadata_id, "")
                        w = s.WhichOneof("value")
                        v = float(getattr(s, w)) if w else 0.0
                        if key == "device_offset_ps":
                            offset = v
                        elif key == "device_duration_ps":
                            dur = v
                    rec = (offset, dur, md.name)
                    (modules if line.name == "XLA Modules" else
                     ops).append(rec)
            modules.sort()
            mstarts = [m[0] for m in modules]
            import bisect
            for off, dur, name in ops:
                mi = bisect.bisect_right(mstarts, off) - 1
                mod = ""
                if 0 <= mi < len(modules) and \
                        off < modules[mi][0] + modules[mi][1] + 1:
                    mod = modules[mi][2]
                # instruction identifier = leading %name
                m = re.match(r"%([\w\.\-]+) ?=", name)
                instr = m.group(1) if m else name.split(" ")[0]
                out.append((instr, mod, dur))
    return out


# -------------------------------------------------------------- hlo dump
def load_op_names(dump_dir: str) -> Dict[str, Dict[str, str]]:
    """{module_key: {instr_name: op_name_path}} from optimized HLO dumps.
    For fusions, the path of the fusion instruction's own metadata is
    used (XLA stamps a representative op)."""
    files = sorted(
        glob.glob(os.path.join(dump_dir, "*after_optimizations.txt")) +
        glob.glob(os.path.join(dump_dir, "**", "*after_optimizations.txt"),
                  recursive=True))
    result: Dict[str, Dict[str, str]] = {}
    for path in files:
        with open(path) as f:
            text = f.read()
        mname = re.search(r"HloModule (\S+?),", text)
        key = os.path.basename(path)
        table: Dict[str, str] = {}
        for m in re.finditer(
                r"%([\w\.\-]+) ?= [^\n]*?op_name=\"([^\"]+)\"", text):
            table[m.group(1)] = m.group(2)
        result[key] = table
        result.setdefault("__by_module__", {})[key] = \
            mname.group(1) if mname else ""
    return result


def best_dump_for(instrs: List[str],
                  dumps: Dict[str, Dict[str, str]]) -> Optional[str]:
    """Pick the dump whose instruction-name set overlaps the traced ops
    most (several executables share the generic name jit_fn)."""
    best, score = None, -1
    want = set(instrs)
    for key, table in dumps.items():
        if key == "__by_module__":
            continue
        s = len(want & set(table))
        if s > score:
            best, score = key, s
    return best


# ----------------------------------------------------------------- table
class Node:
    __slots__ = ("name", "self_ps", "total_ps", "count", "children")

    def __init__(self, name):
        self.name = name
        self.self_ps = 0.0
        self.total_ps = 0.0
        self.count = 0
        self.children: Dict[str, "Node"] = {}


def build_tree(rows: List[Tuple[str, float]]) -> Node:
    root = Node("")
    for path, ps in rows:
        parts = [p for p in path.split("/") if p]
        node = root
        node.total_ps += ps
        for p in parts:
            node = node.children.setdefault(p, Node(p))
            node.total_ps += ps
        node.self_ps += ps
        node.count += 1
    return root


def print_tree(root: Node, depth: int, top: int, out=sys.stdout):
    total = root.total_ps or 1.0
    print(f"{'module':72s} {'total ms':>10s} {'self ms':>9s} "
          f"{'%':>6s} {'calls':>6s}", file=out)
    print("-" * 108, file=out)

    def walk(node: Node, prefix: str, level: int):
        kids = sorted(node.children.values(),
                      key=lambda n: -n.total_ps)[:top]
        for kid in kids:
            name = ("  " * level) + kid.name
            print(f"{name[:72]:72s} {kid.total_ps/1e9:10.3f} "
                  f"{kid.self_ps/1e9:9.3f} "
                  f"{100*kid.total_ps/total:6.1f} {kid.count:6d}",
                  file=out)
            if level + 1 < depth:
                walk(kid, prefix, level + 1)

    walk(root, "", 0)
    print("-" * 108, file=out)
    print(f"{'TOTAL device time':72s} {total/1e9:10.3f}", file=out)


def analyze(profile_dir: str, dump_dir: str, depth: int, top: int,
            out=sys.stdout):
    ops = load_xla_ops(profile_dir)
    dumps = load_op_names(dump_dir)
    # group traced ops by traced module, resolve each to its best dump
    by_mod: Dict[str, List[Tuple[str, float]]] = collections.defaultdict(
        list)
    for instr, mod, ps in ops:
        by_mod[mod].append((instr, ps))
    rows: List[Tuple[str, float]] = []
    unattributed = 0.0
    for mod, items in by_mod.items():
        dump_key = best_dump_for([i for i, _ in items], dumps)
        table = dumps.get(dump_key, {}) if dump_key else {}
        for instr, ps in items:
            path = table.get(instr)
            if path is None:
                # strip the leading jit wrapper for readability
                unattributed += ps
                rows.append((f"(unattributed)/{instr.split('.')[0]}", ps))
            else:
                rows.append((re.sub(r"^jit\([^)]*\)/", "", path), ps))
    tree = build_tree(rows)
    print_tree(tree, depth, top, out=out)
    total = sum(ps for _, ps in rows) or 1.0
    print(f"attributed: {100*(1-unattributed/total):.1f}% of device time",
          file=out)
    return tree


def capture(model_dir: str, profile_dir: str, dump_dir: str):
    """Tiny offline run with trace + HLO dump enabled (the runner's
    NMV_TPU_DUMP_HLO hook — the axon tunnel scrubs --xla_dump_to)."""
    os.environ["NMV_TPU_DUMP_HLO"] = dump_dir
    import jax

    from neural_magic_vllm_tpu import LLM, SamplingParams
    llm = LLM(model=model_dir, dtype="bfloat16", max_model_len=256,
              block_size=16, max_num_seqs=8, enforce_eager=True,
              num_gpu_blocks_override=256)
    llm.generate(["warm up the executables please"],
                 SamplingParams(temperature=0.0, max_tokens=8))
    with jax.profiler.trace(profile_dir):
        llm.generate(["profile this prefill and decode pass"] * 4,
                     SamplingParams(temperature=0.0, max_tokens=16))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile-dir", required=True)
    ap.add_argument("--hlo-dump-dir", required=True)
    ap.add_argument("--capture-model", default=None,
                    help="run a tiny offline capture with this model "
                    "first (writes into the two dirs)")
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()
    if args.capture_model:
        capture(args.capture_model, args.profile_dir, args.hlo_dump_dir)
    analyze(args.profile_dir, args.hlo_dump_dir, args.depth, args.top)


if __name__ == "__main__":
    main()
