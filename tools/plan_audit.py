"""Physical-plan inventory for every contract query — the auditable
evidence behind the scale claims: how many exchanges, which joins
broadcast, whether Python intrudes on the hot path, what pushes to
the scans. Usage::

    python tools/plan_audit.py [sf_dir] [--write PLANS.md]

Stage-churn note: this builds (never executes) each query's plan, so
it is cheap; queries whose CONSTRUCTION runs bounded actions (IVF/PQ
training samples, funnel step counts, CC convergence probes) still
pay those — documented per-operator.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pond_spark.plans import (  # noqa: E402
    count_exchanges,
    formatted_plan,
)


def audit(sf_dir: str) -> list[dict]:
    import __spark_entry__ as entry
    from pond_spark.session import get_spark

    spark = get_spark("plan_audit")
    rows = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = formatted_plan(df)
            rows.append(
                {
                    "query": name,
                    "exchanges": count_exchanges(df),
                    "bhj": plan.count("BroadcastHashJoin"),
                    "smj": plan.count("SortMergeJoin"),
                    "nlj": plan.count("NestedLoopJoin"),
                    "python": plan.count("EvalPython")
                    + plan.count("MapInPandas")
                    + plan.count("FlatMapGroupsInPandas"),
                    # ANY scan with a non-empty pushed-filter list —
                    # requiring EVERY scan non-empty let one filterless
                    # dim scan mask real pushdown on the fact scan
                    "pushed": any(
                        f.strip()
                        for f in re.findall(
                            r"PushedFilters: \[([^\]]*)\]", plan
                        )
                    ),
                }
            )
        except Exception as e:  # noqa: BLE001
            rows.append({"query": name, "error": repr(e)[:80]})
    return rows


def main() -> None:
    # positional sf_dir is the first NON-flag argument: bare
    # `plan_audit.py --write PLANS.md` must not treat '--write' as the
    # sf_dir and clobber the inventory with an all-ERROR table
    positionals = [a for a in sys.argv[1:] if not a.startswith("--")]
    flag_vals = set()
    if "--write" in sys.argv:
        flag_vals.add(sys.argv[sys.argv.index("--write") + 1])
    positionals = [a for a in positionals if a not in flag_vals]
    sf_dir = positionals[0] if positionals else "/root/testdata/sf0.001"
    rows = audit(sf_dir)
    out = []
    out.append("| query | exch | bcast | smj | nlj | py | pushdown |")
    out.append("|---|---|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            out.append(f"| {r['query']} | ERROR: {r['error']} |")
            continue
        out.append(
            f"| {r['query']} | {r['exchanges']} | {r['bhj']} | {r['smj']} "
            f"| {r['nlj']} | {r['python']} | {'y' if r['pushed'] else ''} |"
        )
    text = "\n".join(out)
    print(text)
    if "--write" in sys.argv:
        path = sys.argv[sys.argv.index("--write") + 1]
        with open(path, "w") as fh:
            fh.write(
                "# Physical-plan inventory (tools/plan_audit.py, "
                f"{sf_dir})\n\n"
                "Per contract query: exchange count, broadcast-hash /"
                " sort-merge / nested-loop join counts, Python batch"
                " operators in the plan, and whether any filter pushed"
                " into a scan. Python appears ONLY where Spark lacks"
                " the primitive (media decode, the stateful rate-limit"
                " replay in stats). Nested-loop joins appear ONLY as"
                " single-row broadcast crosses attaching a scalar"
                " (corpus stats / vocab size in tfidf, bm25,"
                " nb_classify, perplexity, stats — O(rows x 1)) and as"
                " knn_join's guarded broadcast cartesian; never"
                " between two data-sized relations.\n\n"
                + text
                + "\n"
            )


if __name__ == "__main__":
    main()
