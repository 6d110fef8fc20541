#!/usr/bin/env python
"""Codegen-fallback sweep (r13, VERDICT r12 item 7): flag every registered
query whose physical plan contains a codegen-CAPABLE operator that did NOT
get a whole-stage codegen id — the silent-interpreted-execution class the
r12 embed_moments find exposed (a 257-buffer-field HashAggregate above
``spark.sql.codegen.maxFields`` fell back to interpreted mode with no
warning and ran ~8x slower).

Method: for each query, CONSTRUCT the DataFrame and read
``explain('formatted')`` with **AQE disabled for the audit session**: an
un-executed AdaptiveSparkPlan prints its initial plan with NO codegen ids
at all (verified live — the ids are only assigned when each query stage is
materialized), so the static audit must plan without AQE.  With AQE off,
every operator's detail header reads ``(n) OpName [codegen id : k]`` when
the operator was fused into a WholeStageCodegen stage; a codegen-capable
operator whose header lacks the codegen id is running interpreted.  The
fallback conditions this hunts (aggregate/projection wider than
``codegen.maxFields``, CodegenFallback-only operators, unsupported
boundaries) are plan-static, so AQE-off detection is valid for them; AQE's
runtime join rewrites are out of scope here (covered by test_plans pins).

Operators considered codegen-capable (CodegenSupport subclasses that are
expected to fuse in Spark 4.x); anything else (Exchange, Window, Scan,
python evals, object ops, streaming state ops...) is ignored:
  HashAggregate SortAggregate Project Filter Sort Expand Generate Range
  BroadcastHashJoin ShuffledHashJoin SortMergeJoin BroadcastNestedLoopJoin
  ColumnarToRow LocalLimit GlobalLimit

Known-benign flags (suppressed, printed with reasons at the end):
  - operators inside an un-executed AdaptiveSparkPlan leaf exchange stage
    get their codegen ids only at runtime; the audit runs on the INITIAL
    plan, which Spark still annotates, so this has not been observed — if
    a query's whole plan shows zero codegen ids, the audit reports it as
    "no-codegen-anywhere" for manual review instead of flagging each node.

Usage: python tools/codegen_audit.py [out.jsonl] [sf_dir]
Exit code 1 iff unexplained flags were found.
"""
from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mu_swarm_logger_service_spark import all_queries, get_spark  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/codegen_audit.jsonl"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

CODEGEN_CAPABLE = (
    "HashAggregate", "SortAggregate", "Project", "Filter", "Sort",
    "Expand", "Generate", "Range", "BroadcastHashJoin", "ShuffledHashJoin",
    "SortMergeJoin", "BroadcastNestedLoopJoin", "ColumnarToRow",
    "LocalLimit", "GlobalLimit",
)

_HDR = re.compile(r"^\(\d+\)\s+(\S+)(.*)$")
_WIDTH = re.compile(r"(?:Output|Input|Results|Aggregate Attributes) \[(\d+)\]")

# Cause classification (first match wins).  Everything the classifier
# cannot attribute to a KNOWN, by-design interpretation cause is reported
# as unexplained and fails the audit — the r12 embed_moments bug (wide
# aggregate silently over codegen.maxFields) lands in the WIDE bucket.
BY_DESIGN = {
    "hof-codegen-fallback":
        "operator hosts a higher-order-function expression "
        "(lambdafunction in the detail block); HOFs are CodegenFallback "
        "in Spark 4 and exclude their operator from whole-stage codegen "
        "by design (SCALE.md 'Python boundary'/round-6 minhash record)",
    "sort-agg-buffer-type":
        "SortAggregate chosen because the aggregate buffer is not "
        "hash-aggregable (min/max over struct tiebreaks, the engine's "
        "determinism rule); SortAggregate with grouping keys does not "
        "participate in whole-stage codegen",
    "columnar-boundary":
        "ColumnarToRow feeding a non-codegen parent (python eval, "
        "object agg, generator fallback) cannot fuse",
    "bnlj-join-type":
        "BroadcastNestedLoopJoin only supports codegen for inner joins",
    "smj-join-type":
        "SortMergeJoin full-outer / existence variants do not codegen",
    "imperative-agg-no-codegen":
        "HashAggregate whose function is a plain ImperativeAggregate "
        "(pivotfirst) — no codegen implementation exists for it",
    "generator-no-codegen":
        "GenerateExec only codegens the explode family; replicaterows "
        "(INTERSECT ALL / EXCEPT ALL rewrites) runs interpreted by design",
    "union-loop-logical-subtree":
        "recursive-CTE UnionLoop body: a LOGICAL subtree the engine "
        "re-plans physically per iteration; not statically auditable",
    "hll-buffer-width":
        "approx_count_distinct's HLL buffer exceeds codegen.maxFields by "
        "construction at tight rsd; narrowing it would change results",
}


def classify(op: str, detail: str, max_fields: int) -> str:
    if detail and "Input" not in detail and "Output" not in detail:
        # A detail block with only "Arguments:" is a LOGICAL node — the
        # body of a UnionLoop (recursive CTE), which Spark re-plans
        # physically at runtime each iteration; nothing to audit statically.
        return "union-loop-logical-subtree"
    if "lambdafunction(" in detail:
        return "hof-codegen-fallback"
    widths = [int(w) for w in _WIDTH.findall(detail)]
    if widths and max(widths) > max_fields:
        if "approx_count_distinct(" in detail:
            # The HLL++ buffer at tight rsd is hundreds of longs — over
            # codegen.maxFields by construction, and not narrowable
            # without changing the sketch's accuracy (a result change).
            # What IS fixable is the buffer riding other aggregates'
            # shuffles: see q_agg_approx_distinct's split-aggregate note.
            return "hll-buffer-width"
        return "WIDE-EXCEEDS-MAXFIELDS"
    if "pivotfirst(" in detail:
        return "imperative-agg-no-codegen"
    if op == "Generate" and "replicaterows(" in detail:
        return "generator-no-codegen"
    if op == "SortAggregate":
        return "sort-agg-buffer-type"
    if op == "ColumnarToRow":
        return "columnar-boundary"
    if op == "BroadcastNestedLoopJoin":
        return "bnlj-join-type"
    if op == "SortMergeJoin" and ("FullOuter" in detail
                                  or "ExistenceJoin" in detail):
        return "smj-join-type"
    return "UNEXPLAINED"


_TREE = re.compile(r"^[\s:+|-]*(\*\s)?([A-Za-z][A-Za-z0-9_]*)[^()]*\((\d+)\)\s*$")


def audit_plan(plan: str, max_fields: int) -> tuple[list, int, int]:
    """-> ([(op, cause, header)...] for non-codegen capable ops,
    n_capable, n_codegen).

    Codegen membership is read from the TREE section's ``*`` prefix (the
    authoritative rendering — one line per operator including subquery
    trees), NOT from the detail blocks' ``[codegen id : n]`` annotation:
    the detail annotation was observed dropping ids for operators on the
    streamed side of joins whose broadcast exchange is reused (e.g.
    q_join_theta_range's Filter prints un-annotated in its detail block
    while the tree stars it), which would mint false flags.  Detail
    blocks are still parsed — for the CAUSE classification of truly
    unstarred operators."""
    details: dict[str, str] = {}
    cur_id = None
    for ln in plan.splitlines():
        m = _HDR.match(ln.strip())
        if m and ln.startswith("("):
            cur_id = ln.strip().split(")")[0].lstrip("(")
            details.setdefault(cur_id, "")
        elif cur_id is not None:
            details[cur_id] = details[cur_id] + ln + "\n"
    flagged, n_capable, n_codegen = [], 0, 0
    seen: set[str] = set()
    for ln in plan.splitlines():
        m = _TREE.match(ln.rstrip())
        if not m:
            continue
        starred, op, op_id = bool(m.group(1)), m.group(2), m.group(3)
        if op not in CODEGEN_CAPABLE or op_id in seen:
            continue
        seen.add(op_id)
        n_capable += 1
        if starred:
            n_codegen += 1
            continue
        cause = classify(op, details.get(op_id, ""), max_fields)
        flagged.append((op, cause, f"({op_id}) {op}"))
    return flagged, n_capable, n_codegen


def main() -> None:
    spark = get_spark("codegen-audit")
    # Static audit: no codegen ids are printed inside an un-executed
    # AdaptiveSparkPlan (see module docstring).  The audited fallback
    # classes are plan-static, so AQE-off planning is the right lens.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    max_fields = int(spark.conf.get("spark.sql.codegen.maxFields", "100"))
    qs = all_queries()
    unexplained: list[tuple[str, str, str]] = []
    wide: list[tuple[str, str]] = []
    with open(OUT, "w") as fh:
        for name, fn in qs.items():
            rec: dict = {"name": name}
            try:
                df = fn(spark, SF_DIR)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
                flagged, n_cap, n_cg = audit_plan(plan, max_fields)
                rec.update(n_capable=n_cap, n_codegen=n_cg)
                rec["flagged"] = [
                    {"op": op, "cause": cause, "hdr": hdr}
                    for op, cause, hdr in flagged]
                for op, cause, hdr in flagged:
                    if cause == "WIDE-EXCEEDS-MAXFIELDS":
                        wide.append((name, hdr))
                    elif cause == "UNEXPLAINED":
                        unexplained.append((name, op, hdr))
            except Exception as e:  # noqa: BLE001 - audit must not abort
                rec["err"] = f"{type(e).__name__}: {e}"[:300]
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
    print(f"wrote {OUT}")
    for name, hdr in wide:
        print(f"  WIDE-EXCEEDS-MAXFIELDS {name}: {hdr}")
    for name, op, hdr in unexplained:
        print(f"  UNEXPLAINED {name}: {hdr}")
    if wide or unexplained:
        print(f"flags: {len(wide)} wide, {len(unexplained)} unexplained")
        sys.exit(1)
    print("no unexplained codegen fallbacks")


if __name__ == "__main__":
    main()
