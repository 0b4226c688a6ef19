#!/usr/bin/env python3
"""Round-close bench ritual (dev tooling, not part of the library).

Usage: python3 tools/roundclose.py <round_number> [sf_dir]

Three consecutive rounds missed the same round-end hygiene by hand, so
it is a script now. Run this AFTER the final registry change of the
round, on a quiet machine. It:

  1. runs `sbt runMain graft.Bench` TWICE (double bench: run-to-run
     agreement separates ambient load from plan cost);
  2. archives both runs' artifacts under the TRACKED bench/ dir as
     bench/r{N}_out_run{1,2}.json + bench/r{N}_metrics_run{1,2}.jsonl
     (rounds 9-12 lost their per-query metrics because the files were
     untracked scratch — cross-round adjudication needs them);
  3. runs tools/trendcheck.py run1 vs run2 — same code, same data, so
     every structural metric (shuffle/input/tasks/spill) must agree;
  4. if bench/r{N-1}_metrics_run2.jsonl exists, trendchecks THIS round
     against the previous one — the cross-round structural regression
     gate;
  5. emits bench/r{N}_summary.md: totals, the normalized warmup
     canary, and an ADJUDICATED line for every query whose wall moved
     >1.3x vs the previous round (cpu flat => load; cpu up with
     structural metrics flat => real plan cost; shuffle/input/tasks
     moved => plan shape change — quote the moved metric). Paste the
     summary into SURVEY.md's round-results section and commit
     IN-ROUND.

Exit code: 0 if run1/run2 agree structurally, else the trendcheck
flag count.
"""
import glob
import json
import os
import re
import shutil
import subprocess
import sys

RATIO = 1.3

ENTRY_FILE = "src/main/scala/graft/SparkEntry.scala"


def _git(*args):
    p = subprocess.run(["git"] + list(args), stdout=subprocess.PIPE,
                       text=True)
    return p.stdout if p.returncode == 0 else ""


def _registry_chunks(src):
    """Map registry key -> the text of its entry (up to the next key),
    so multi-line entries attribute their continuation lines."""
    keys = [(m.start(), m.group(1))
            for m in re.finditer(r'"([a-z0-9_]+)"\s*->', src)]
    chunks = {}
    for i, (pos, key) in enumerate(keys):
        end = keys[i + 1][0] if i + 1 < len(keys) else len(src)
        chunks.setdefault(key, src[pos:end])
    return chunks


def build_change_map(n):
    """query name -> True if its implementing code changed since the
    r{n-1} close, False if provably unchanged, None if undeterminable.

    'real plan cost' is only a legal verdict for a CHANGED query: an
    unchanged operator whose cpu moved is ambient/JIT by definition
    (the r15 q1_pricing/q3_shipping mislabel). Change sources checked:
    the operator's implementing .scala files (object names referenced
    on its registry line), its own SparkEntry registry chunk, and
    graft.conf (shared tunables)."""
    base = _git("log", "--format=%H", "-1", "--",
                f"bench/r{n-1}_out_run2.json").strip()
    if not base:
        return {}
    changed = set(_git("diff", "--name-only", base, "HEAD", "--",
                       "src/main/scala").split())
    conf_changed = bool(_git("diff", "--name-only", base, "HEAD", "--",
                             "graft.conf").strip())
    obj_file = {}
    for path in glob.glob("src/main/scala/**/*.scala", recursive=True):
        try:
            txt = open(path).read()
        except OSError:
            continue
        for m in re.finditer(r"\bobject\s+(\w+)", txt):
            obj_file.setdefault(m.group(1), path)
    cur_src = open(ENTRY_FILE).read()
    old_src = _git("show", f"{base}:{ENTRY_FILE}")
    cur_chunks = _registry_chunks(cur_src)
    old_chunks = _registry_chunks(old_src) if old_src else {}
    out = {}
    for key, chunk in cur_chunks.items():
        impls = {obj_file[o] for o in re.findall(r"\b([A-Z]\w*)\.", chunk)
                 if o in obj_file}
        if not impls:
            out[key] = None
            continue
        out[key] = (conf_changed
                    or bool(impls & changed)
                    or old_chunks.get(key) != chunk)
    return out


def run_bench(env):
    p = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    if p.returncode != 0:
        sys.stderr.write(p.stdout[-4000:])
        sys.exit(f"bench run failed rc={p.returncode}")
    return json.load(open("bench_out.json"))


def n_queries(out):
    """Registry size of a bench artifact: n_queries since r13; older
    artifacts carry 'queries' as the count itself (an int), and the
    driver's per-query map variant is a dict."""
    if "n_queries" in out:
        return out["n_queries"]
    q = out.get("queries")
    if isinstance(q, int):
        return q
    return len(q) if q is not None else -1


def load_metrics(path):
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                r = json.loads(line)
                rows[r["name"]] = r
    return rows


def adjudicate(name, prev, cur, prev_memo=None, cur_memo=None,
               code_changed=None):
    """One verdict line for a >1.3x wall move, from the task metrics.

    prev_memo/cur_memo: this query's memo-build map ({tag: sec}) from
    the rounds' bench_out artifacts — a wall/cpu move caused purely by
    which query first materialized a shared memo table must adjudicate
    as OWNERSHIP, not plan cost (the r14 pagerank_pairs lesson).
    code_changed: git-diff verdict from build_change_map — an operator
    whose implementing code did NOT change since the previous close can
    never be 'real plan cost'; a cpu move on unchanged code is
    ambient/JIT (the r15 q1_pricing/q3_shipping mislabel)."""
    wall = cur["wallSec"] / max(prev["wallSec"], 1e-9)
    cpu = cur["cpuSec"] / max(prev["cpuSec"], 1e-9)
    moved = []
    for k in ("shuffleReadBytes", "shuffleWriteBytes", "inputBytes",
              "inputRows", "tasks"):
        a, b = prev.get(k, 0), cur.get(k, 0)
        floor = (1 << 20) if "Bytes" in k else 0
        if max(a, b) <= floor:
            continue
        if min(a, b) == 0 or max(a, b) / min(a, b) > 1.5:
            moved.append(f"{k} {a}->{b}")
    pm, cm = prev_memo or {}, cur_memo or {}
    gained = {t: s for t, s in cm.items() if t not in pm and s > 0.2}
    lost = {t: s for t, s in pm.items() if t not in cm and s > 0.2}
    memo_bits = []
    if gained:
        memo_bits.append("now first-builds " + ", ".join(
            f"{t} ({s:.1f}s)" for t, s in gained.items()))
    if lost:
        memo_bits.append("no longer builds " + ", ".join(
            f"{t} ({s:.1f}s)" for t, s in lost.items()))
    cpu_follows_wall = (cpu > 1.15) if wall > 1 else (cpu < 1 / 1.15)
    if memo_bits and not moved:
        verdict = "MEMO OWNERSHIP moved: " + "; ".join(memo_bits)
    elif moved:
        verdict = "PLAN SHAPE moved: " + "; ".join(moved)
        if memo_bits:
            verdict += " [memo: " + "; ".join(memo_bits) + "]"
    elif cpu_follows_wall:
        cpu_txt = f"cpu {prev['cpuSec']:.1f}->{cur['cpuSec']:.1f}s, structure flat"
        if code_changed is False:
            verdict = f"ambient/JIT ({cpu_txt}, code UNCHANGED since prev close)"
        elif code_changed is None:
            verdict = f"cpu moved, attribution unknown ({cpu_txt}; no git base/impl mapping)"
        else:
            verdict = f"real plan cost ({cpu_txt}, impl changed this round)"
    else:
        verdict = f"ambient load (cpu ratio {cpu:.2f} flat, structure flat)"
    return (f"- `{name}` wall {prev['wallSec']:.2f}s -> {cur['wallSec']:.2f}s "
            f"({wall:.2f}x): {verdict}")


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    n = int(sys.argv[1])
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf)
    os.makedirs("bench", exist_ok=True)

    outs = []
    for run in (1, 2):
        print(f"[roundclose] bench run {run}/2 ...", flush=True)
        out = run_bench(env)
        shutil.copy("bench_out.json", f"bench/r{n}_out_run{run}.json")
        shutil.copy("bench_metrics.jsonl", f"bench/r{n}_metrics_run{run}.jsonl")
        outs.append(out)
        print(f"[roundclose]   total={out['value']:.1f}s "
              f"warmup/query={out.get('warmup_sec_per_query', -1):.2f}s", flush=True)

    intra = subprocess.run(
        [sys.executable, "tools/trendcheck.py",
         f"bench/r{n}_metrics_run1.jsonl", f"bench/r{n}_metrics_run2.jsonl"],
        stdout=subprocess.PIPE, text=True)
    print(intra.stdout)

    lines = [f"### Round-{n} double bench (sf_dir={sf})", ""]
    for i, out in enumerate(outs, 1):
        lines.append(f"- run {i}: total {out['value']:.1f}s over "
                     f"{n_queries(out)} queries; warmup canary "
                     f"{out.get('warmup_sec', -1):.1f}s "
                     f"({out.get('warmup_sec_per_query', -1):.2f} s/query)")
    lines.append(f"- run1 vs run2 structural trendcheck: "
                 f"{'CLEAN' if intra.returncode == 0 else f'{intra.returncode} flags (see below)'}")
    if intra.returncode:
        lines += ["", "```", intra.stdout.strip(), "```"]

    prev_path = f"bench/r{n-1}_metrics_run2.jsonl"
    if os.path.exists(prev_path):
        prev = load_metrics(prev_path)
        cur = load_metrics(f"bench/r{n}_metrics_run2.jsonl")

        def memo_map(path):
            try:
                return json.load(open(path)).get("memo_builds", {})
            except (OSError, json.JSONDecodeError):
                return {}
        prev_mb = memo_map(f"bench/r{n-1}_out_run2.json")
        cur_mb = memo_map(f"bench/r{n}_out_run2.json")
        change_map = build_change_map(n)
        lines += ["", f"Cross-round wall moves >{RATIO}x vs r{n-1} (adjudicated "
                      "from task metrics + memo-build attribution + git diff):"]
        moves = 0
        for name in sorted(set(prev) & set(cur)):
            w0, w1 = prev[name]["wallSec"], cur[name]["wallSec"]
            if max(w0, w1) > 0.5 and max(w0, w1) / max(min(w0, w1), 1e-9) > RATIO:
                lines.append(adjudicate(name, prev[name], cur[name],
                                        prev_mb.get(name), cur_mb.get(name),
                                        change_map.get(name)))
                moves += 1
        if not moves:
            lines.append("- none")
        xr = subprocess.run(
            [sys.executable, "tools/trendcheck.py", prev_path,
             f"bench/r{n}_metrics_run2.jsonl"],
            stdout=subprocess.PIPE, text=True)
        lines.append(f"- cross-round structural trendcheck: "
                     f"{xr.returncode} flagged queries")
    else:
        lines += ["", f"- no r{n-1} metrics archive (this script starts the "
                      "tracked archive at r" + str(n) + "); cross-round "
                      "adjudication begins next round"]

    summary = "\n".join(lines) + "\n"
    open(f"bench/r{n}_summary.md", "w").write(summary)
    print(summary)
    sys.exit(intra.returncode)


if __name__ == "__main__":
    main()
