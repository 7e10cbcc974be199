"""HBM-traffic table for the flagship train step (VERDICT r2 item 8).

Walks the ENTRY computation of the *compiled* HLO module and attributes
bytes-accessed (operand reads + output writes, TPU tile-padding aware) to
each top-level instruction, grouped by op class. This substantiates the
aggregate "bytes accessed" number XLA's cost analysis reports with an
op-class breakdown, and names the largest individual traffic sites so
reduction candidates are concrete instead of guessed.

The model is approximate where XLA is smarter (a fusion may not re-read
an operand it recomputes; DUS in-place updates write only the slice) but
it is the same accounting cost_analysis uses, and the table prints the
cost-analysis total next to the walked total for calibration.

New observability vs the reference (which has no profiler; SURVEY.md §5).
"""

import argparse
import json
import re
import sys

import numpy as np

_DTYPE_BYTES = {
    "f64": 8, "s64": 8, "u64": 8, "c64": 8,
    "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f8e4m3fn": 1, "f8e5m2": 1, "s8": 1, "u8": 1, "pred": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\](?:\{([^}]*)\})?")
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\(.*?\)|[^\s(]+)\s+([\w\-]+)\(")


def _one_shape_bytes(dtype, dims, layout):
    """Physical bytes of one array, honoring TPU tiling (T(8,128) pads the
    two minor dims; T(Sx8,128) for packed types)."""
    if dtype == "token" or dtype not in _DTYPE_BYTES:
        return 0
    n = _DTYPE_BYTES[dtype]
    dims = [int(d) for d in dims.split(",") if d] or [1]
    tile = None
    if layout:
        m = re.search(r"T\((\d+),(\d+)\)", layout)
        if m:
            tile = (int(m.group(1)), int(m.group(2)))
    if tile and len(dims) >= 1:
        pdims = list(dims)
        pdims[-1] = -(-pdims[-1] // tile[1]) * tile[1]
        if len(pdims) >= 2:
            pdims[-2] = -(-pdims[-2] // tile[0]) * tile[0]
        dims = pdims
    return int(np.prod(dims)) * n


def shape_bytes(shape_str):
    """Total physical bytes of a (possibly tuple) HLO shape string."""
    return sum(_one_shape_bytes(d, dims, lay)
               for d, dims, lay in _SHAPE_RE.findall(shape_str))


def classify(opcode, line):
    if opcode == "custom-call":
        if "attn" in line or "attention" in line or "mosaic" in line.lower():
            return "pallas attention custom-call"
        return "custom-call (other)"
    if opcode == "fusion":
        m = re.search(r"kind=k(\w+)", line)
        kind = m.group(1) if m else "?"
        if "conv" in line or "dot" in line:
            return f"fusion:{kind} (matmul)"
        if "rng" in line:
            return f"fusion:{kind} (rng)"
        return f"fusion:{kind}"
    if opcode in ("copy", "copy-start", "copy-done"):
        return "copy"
    if opcode.startswith("all-") or opcode in ("reduce-scatter",
                                               "collective-permute"):
        return "collective"
    if opcode in ("convolution", "dot"):
        return "bare matmul"
    return opcode


def walk_entry(hlo_text):
    """Yield (name, opcode, class, out_bytes, operand_bytes, line) for each
    top-level instruction of the ENTRY computation."""
    entry, depth, in_entry = [], 0, False
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry:
            if line.strip() == "}":
                break
            entry.append(line)

    shapes = {}
    rows = []
    for line in entry:
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape_str, opcode = m.group(1), m.group(2), m.group(3)
        shapes[name] = shape_str
        if opcode in ("parameter", "constant", "get-tuple-element",
                      "bitcast", "tuple", "after-all"):
            continue
        args = line[m.end():]
        # cut trailing kwargs (operand list ends at the matching paren of
        # the opcode call; a cheap approximation: stop at "), " or ")$")
        operand_names = []
        for tok in re.findall(r"%?([\w.\-]+)", args.split("), ")[0]):
            if tok in shapes and tok != name:
                operand_names.append(tok)
        out_b = shape_bytes(shape_str)
        in_b = sum(shape_bytes(shapes[o]) for o in operand_names)
        rows.append({"name": name, "opcode": opcode,
                     "class": classify(opcode, line),
                     "out_bytes": out_b, "in_bytes": in_b,
                     "shape": shape_str if len(shape_str) < 80 else
                     shape_str[:77] + "..."})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--n_neurons", type=int, default=668)
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--json_out", type=str, default=None)
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("MMFM_PLATFORM") == "cpu":   # offline verification
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_prng_impl", "rbg")
    sys.path.insert(0, ".")
    from bench import _build

    state, train_step, spikes, behavior = _build(
        args.batch_size, 100, args.n_neurons)
    k = jax.random.PRNGKey(0)
    compiled = jax.jit(train_step).lower(state, spikes, behavior, k).compile()

    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    ca_bytes = float(cost.get("bytes accessed", 0.0))
    ca_flops = float(cost.get("flops", 0.0))

    hlo = compiled.as_text()
    rows = walk_entry(hlo)
    total = sum(r["out_bytes"] + r["in_bytes"] for r in rows)

    by_class = {}
    for r in rows:
        c = by_class.setdefault(r["class"],
                                {"bytes": 0, "count": 0})
        c["bytes"] += r["out_bytes"] + r["in_bytes"]
        c["count"] += 1

    print(f"# HBM traffic table — train step B={args.batch_size} "
          f"N={args.n_neurons}")
    print(f"cost_analysis: {ca_flops/1e12:.3f} TFLOP, "
          f"{ca_bytes/2**30:.2f} GiB accessed")
    print(f"walked ENTRY total: {total/2**30:.2f} GiB "
          f"({len(rows)} instructions)\n")
    print(f"{'op class':<42}{'count':>6}{'GiB':>9}{'%':>7}")
    for cls, c in sorted(by_class.items(), key=lambda kv: -kv[1]["bytes"]):
        print(f"{cls:<42}{c['count']:>6}{c['bytes']/2**30:>9.3f}"
              f"{100*c['bytes']/total:>6.1f}%")

    print(f"\ntop {args.top} single instructions by bytes:")
    for r in sorted(rows, key=lambda r: -(r["out_bytes"] + r["in_bytes"])
                    )[:args.top]:
        b = (r["out_bytes"] + r["in_bytes"]) / 2**20
        print(f"  {b:9.1f} MiB  {r['class']:<30} {r['name'][:40]:<42} "
              f"{r['shape']}")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"batch_size": args.batch_size,
                       "cost_analysis_bytes": ca_bytes,
                       "cost_analysis_flops": ca_flops,
                       "walked_bytes": total,
                       "by_class": by_class,
                       "top": sorted(rows, key=lambda r: -(r["out_bytes"]
                                                           + r["in_bytes"])
                                     )[:50]}, f, indent=1)


if __name__ == "__main__":
    main()
