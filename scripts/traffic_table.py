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


def _classify_event(name):
    """Class for a trace event whose name is not an ENTRY instruction
    (sub-computation ops, Mosaic kernel names, layout-assignment clones).
    The 'XLA Ops' lane tiles the step with zero gaps, so attributing every
    event keeps the time column summing to the true step time."""
    base = re.sub(r"[.\d]+$", "", name)
    if "attn" in base:
        return "pallas attention custom-call"
    if "rng" in base:
        return "fusion:Loop (rng)"
    if base.startswith(("copy", "slice", "dynamic-update-slice",
                        "dynamic_update_slice", "bitcast", "reshape",
                        "convert_element_type", "broadcast")):
        return "copy"
    if "convolution" in base or "dot" in base:
        return "fusion:Output (matmul)"
    if base.endswith("fusion") or base == "fusion":
        return "fusion (sub/cloned)"
    if base in ("reduce", "maximum_compare_fusion"):
        return "fusion (sub/cloned)"
    return "other"


def _trace_op_times(trace_dir, n_steps, entry_names):
    """Mean device time per step from a jax.profiler trace, split into
    (a) exact joins onto ENTRY instruction names and (b) class-level
    residuals for every other 'XLA Ops' event (ops inside called
    computations carry kernel/clone names, not ENTRY names)."""
    import glob
    import gzip

    paths = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return {}, {}, {}
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("args", {}).get("name") == "XLA Ops"
               and (e["pid"] in dev_pids or not dev_pids)}
    times, extra, extra_by_name = {}, {}, {}
    for e in ev:
        if (e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids):
            n, dur = e["name"], e.get("dur", 0.0)
            if n in entry_names:
                times[n] = times.get(n, 0.0) + dur
            else:
                c = _classify_event(n)
                extra[c] = extra.get(c, 0.0) + dur
                extra_by_name[n] = extra_by_name.get(n, 0.0) + dur
    return ({n: t / n_steps for n, t in times.items()},
            {c: t / n_steps for c, t in extra.items()},
            {n: t / n_steps for n, t in extra_by_name.items()})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--n_neurons", type=int, default=668)
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--json_out", type=str, default=None)
    ap.add_argument("--trace", action="store_true",
                    help="also run 5 traced steps and join measured device "
                         "time per op class -> implied HBM bandwidth")
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

    op_us, extra_us, extra_names = {}, {}, {}
    if args.trace:
        import tempfile

        trace_dir = tempfile.mkdtemp(prefix="traffic_trace_")
        n_tr = 5
        for _ in range(3):                       # warm
            state, loss = compiled(state, spikes, behavior, k)
        loss.block_until_ready()
        with jax.profiler.trace(trace_dir):
            for _ in range(n_tr):
                state, loss = compiled(state, spikes, behavior, k)
            loss.block_until_ready()
        op_us, extra_us, extra_names = _trace_op_times(
            trace_dir, n_tr, {r["name"] for r in rows})
        for r in rows:
            r["us"] = op_us.get(r["name"], 0.0)

    by_class = {}
    for r in rows:
        c = by_class.setdefault(r["class"],
                                {"bytes": 0, "count": 0, "us": 0.0})
        c["bytes"] += r["out_bytes"] + r["in_bytes"]
        c["count"] += 1
        c["us"] += r.get("us", 0.0)
    for cls, us in extra_us.items():
        # time measured on sub-computation / kernel-named events that have
        # no ENTRY bytes row — attribute the time, leave bytes untouched
        c = by_class.setdefault(cls, {"bytes": 0, "count": 0, "us": 0.0})
        c["us"] += us

    print(f"# HBM traffic table — train step B={args.batch_size} "
          f"N={args.n_neurons}")
    print(f"cost_analysis: {ca_flops/1e12:.3f} TFLOP, "
          f"{ca_bytes/2**30:.2f} GiB accessed")
    print(f"walked ENTRY total: {total/2**30:.2f} GiB "
          f"({len(rows)} instructions)")
    if op_us:
        traced_us = sum(c["us"] for c in by_class.values())
        matched = sum(1 for r in rows if r.get("us"))
        print(f"traced device time: {traced_us/1e3:.2f} ms/step "
              f"({matched}/{len(rows)} instructions matched)")
    print()
    hdr = f"{'op class':<42}{'count':>6}{'GiB':>9}{'%':>7}"
    if op_us:
        hdr += f"{'ms':>9}{'GB/s':>8}"
    print(hdr)
    for cls, c in sorted(by_class.items(), key=lambda kv: -kv[1]["bytes"]):
        line = (f"{cls:<42}{c['count']:>6}{c['bytes']/2**30:>9.3f}"
                f"{100*c['bytes']/total:>6.1f}%")
        if op_us:
            bw = (c["bytes"] / 2**30) / (c["us"] / 1e6) if c["us"] else 0.0
            line += f"{c['us']/1e3:>9.3f}{bw:>8.0f}"
        print(line)

    if op_us:
        print(f"\ntop {args.top} non-ENTRY trace events by device time "
              f"(sub-computation / cloned-fusion names):")
        for n, us in sorted(extra_names.items(), key=lambda kv: -kv[1]
                            )[:args.top]:
            print(f"  {us:9.0f} us/step  [{_classify_event(n):<24}] {n}")

    print(f"\ntop {args.top} single instructions by bytes:")
    for r in sorted(rows, key=lambda r: -(r["out_bytes"] + r["in_bytes"])
                    )[:args.top]:
        b = (r["out_bytes"] + r["in_bytes"]) / 2**20
        t = f" {r['us']:7.0f}us" if op_us else ""
        print(f"  {b:9.1f} MiB{t}  {r['class']:<30} {r['name'][:38]:<40} "
              f"{r['shape']}")

    if op_us:
        print(f"\ntop {args.top} single instructions by device time:")
        for r in sorted(rows, key=lambda r: -r.get("us", 0.0))[:args.top]:
            b = (r["out_bytes"] + r["in_bytes"]) / 2**20
            print(f"  {r['us']:7.0f} us {b:9.1f} MiB  {r['class']:<30} "
                  f"{r['name'][:38]:<40} {r['shape']}")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"batch_size": args.batch_size,
                       "cost_analysis_bytes": ca_bytes,
                       "cost_analysis_flops": ca_flops,
                       "walked_bytes": total,
                       "by_class": by_class,
                       "top_subcomputation_us": dict(sorted(
                           extra_names.items(), key=lambda kv: -kv[1])[:50]),
                       "top": sorted(rows, key=lambda r: -(r["out_bytes"]
                                                           + r["in_bytes"])
                                     )[:50],
                       "top_time": sorted(
                           (r for r in rows if r.get("us")),
                           key=lambda r: -r["us"])[:50]}, f, indent=1)


if __name__ == "__main__":
    main()
