"""Deterministic synthetic transcript fixture (FIXTURES.md).

Everything is a pure function of SEED=42: the driver builds a small
per-conversation *plan* (ids, skeleton/slot/corruption seeds, duplicate
lineage), and turn texts are materialized **distributed** with
``mapInPandas`` over the plan — each conversation's content depends only
on its plan row, so generation parallelizes embarrassingly and two runs
(or two cluster sizes) produce byte-identical tables.

Duplicate labels derive *from* the corruption process (never re-derived
by similarity), so ground truth is exact:

- ``exact``     byte-identical turns, new conv_id, shifted ts
                (reference analog: byte-equal dedup,
                /root/reference/src/deduplication.cpp:1510)
- ``near``      per-turn perturbations: whitespace/case jitter,
                punctuation swaps, <=2 token substitutions on <=30% of
                turns
- ``structural`` drop or duplicate one non-initial turn, turn_idx
                re-packed
- hard negatives: same template skeleton, different entity slots —
  high token overlap that must NOT link (pins precision).
"""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dedupe_spark import schemas

SEED = 42
BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)
DUP_FRACTION = 0.30
HARDNEG_FRACTION = 0.10

# ---------------------------------------------------------------- phrase banks

_NAMES = [
    "alice", "bob", "carol", "dmitri", "elena", "farid", "grace", "hiro",
    "ines", "jamal", "kira", "liam", "mei", "noor", "oskar", "priya",
    "quinn", "rosa", "sven", "tara", "umar", "vera", "wen", "xenia",
    "yusuf", "zoe",
]
_PATHS = [
    "src/main.py", "lib/utils.go", "app/server.rs", "core/engine.cpp",
    "pkg/api/handler.go", "svc/auth/token.py", "web/index.html",
    "infra/deploy.yaml", "db/migrations/0042.sql", "tools/bench.sh",
    "src/parser/lexer.rs", "tests/test_io.py", "cmd/cli/root.go",
    "include/hashdb.h", "notebooks/eda.ipynb", "configs/prod.toml",
]
_CITIES = [
    "oslo", "lima", "kyoto", "accra", "quito", "perth", "turin", "hanoi",
    "leeds", "basel", "medan", "tunis", "varna", "davao", "salem", "gdansk",
]
_TOOLS = ["search", "calc", "exec", "read"]

_USER_TPL = [
    "hey, can you check {path} for errors and tell me what {name} changed last week?",
    "i need the revenue numbers for {city} broken down by month, around {num} records expected.",
    "please summarize the failing tests in {path}, {name} said there were about {num} of them.",
    "quick question: does the deploy script in {path} still reference the {city} cluster?",
    "can you look up {name}'s latest commit touching {path} and explain the change?",
    "what does the function at line {num} of {path} actually do? {name} couldn't tell me.",
    "we got {num} alerts from the {city} region overnight, can you investigate {path}?",
    "help me refactor {path}, it has roughly {num} lines of duplicated logic.",
    "compare throughput between the {city} and fallback deployments, budget is {num} ms.",
    "is the cache in {path} safe under concurrent writes? {name} saw {num} race reports.",
]
_ASSISTANT_TPL = [
    "sure — i inspected {path} and found {num} issues; the largest one was introduced by {name} in a recent refactor.",
    "the breakdown for {city} shows {num} records total, with a clear peak mid-month; details below.",
    "i ran the suite: {num} tests fail in {path}, all traceable to the change {name} merged.",
    "yes, the script in {path} still points at {city}; i recommend updating the endpoint, roughly {num} lines change.",
    "here is the summary: {name} modified {path} to batch writes, cutting latency to {num} ms.",
    "that function validates input offsets; {name} added it and it is called {num} times across the repo.",
    "after checking, the {city} alerts trace to a timeout in {path}; {num} requests exceeded the budget.",
    "i refactored {path} into {num} helper functions; behavior is unchanged and {name} reviewed the diff.",
    "throughput in {city} is {num} ops/sec, about twice the fallback; the bottleneck is in {path}.",
    "the cache in {path} takes a lock per shard; with {num} shards contention is low, as {name} suspected.",
]
_TOOL_TPL = [
    "exit_code=0 file={path} matches={num} owner={name}",
    "query=ok region={city} rows={num} source={path}",
    "ran tests: failed={num} path={path} last_author={name}",
    "grep {path}: {num} hits; top symbol referenced by {name}",
    "fetch {city} metrics: count={num} artifact={path}",
]

# token substitutions used by the `near` corruption — meaning-preserving-ish
_SUBS = {
    "check": "inspect", "errors": "problems", "summarize": "recap",
    "quick": "fast", "latest": "newest", "explain": "describe",
    "investigate": "examine", "roughly": "about", "issues": "defects",
    "recommend": "suggest", "modified": "changed", "unchanged": "the same",
    "bottleneck": "hotspot", "contention": "pressure", "largest": "biggest",
    "failing": "broken", "budget": "limit", "overnight": "last night",
}


# ---------------------------------------------------------------- plan (driver)


def build_plan(n_conv: int, seed: int = SEED) -> pd.DataFrame:
    """Per-conversation generation plan. O(n_conv) rows, driver-side numpy.

    Columns: conv_id, skeleton_seed, slot_seed, corruption_seed, dup_class
    (base/exact/near/structural), cluster_seed_id (conv_id of cluster
    representative), n_turns, conv_offset_s, is_hardneg.
    """
    rng = np.random.default_rng(seed)

    n_turns = 3 + np.minimum(rng.geometric(0.12, size=n_conv), 37)
    skeleton_seed = rng.integers(0, 2**31 - 1, size=n_conv)
    slot_seed = rng.integers(0, 2**31 - 1, size=n_conv)

    # duplicate seeds: first pick, then spawn 1-4 copies each (zipf-clipped)
    is_dup_seed = rng.random(n_conv) < DUP_FRACTION
    seed_idx = np.flatnonzero(is_dup_seed)
    n_copies = np.minimum(rng.zipf(2.0, size=seed_idx.size), 4)

    # hard negatives: among non-dup-seed convs, pair them up so each pair
    # shares a skeleton (same templates) but keeps its own slots.
    non_seed = np.flatnonzero(~is_dup_seed)
    n_hn_pairs = int(len(non_seed) * HARDNEG_FRACTION / 2)
    hn = rng.choice(non_seed, size=2 * n_hn_pairs, replace=False)
    hn_a, hn_b = hn[:n_hn_pairs], hn[n_hn_pairs:]
    skeleton_seed[hn_b] = skeleton_seed[hn_a]  # same skeleton, different slots
    is_hardneg = np.zeros(n_conv, dtype=bool)
    is_hardneg[hn_a] = is_hardneg[hn_b] = True

    rows = []
    for i in range(n_conv):
        rows.append(
            dict(
                conv_id=f"conv-{i:08d}",
                skeleton_seed=int(skeleton_seed[i]),
                slot_seed=int(slot_seed[i]),
                corruption_seed=0,
                dup_class="base",
                cluster_seed_id=f"conv-{i:08d}",
                n_turns=int(n_turns[i]),
                conv_offset_s=int(i) * 3600,
                is_hardneg=bool(is_hardneg[i]),
                hardneg_partner=(
                    f"conv-{int(hn_b[list(hn_a).index(i)]):08d}" if i in set(hn_a) else None
                ),
            )
        )

    next_id = n_conv
    classes = np.array(["exact", "near", "structural"])
    for k, si in enumerate(seed_idx):
        copy_classes = rng.choice(classes, size=int(n_copies[k]))
        for c in copy_classes:
            rows.append(
                dict(
                    conv_id=f"conv-{next_id:08d}",
                    skeleton_seed=int(skeleton_seed[si]),
                    slot_seed=int(slot_seed[si]),
                    corruption_seed=int(rng.integers(0, 2**31 - 1)),
                    dup_class=str(c),
                    cluster_seed_id=f"conv-{int(si):08d}",
                    n_turns=int(n_turns[si]),
                    conv_offset_s=int(next_id) * 3600 + 180,
                    is_hardneg=False,
                    hardneg_partner=None,
                )
            )
            next_id += 1
    return pd.DataFrame(rows)


# ------------------------------------------------------- turn materialization


def _gen_base_turns(skeleton_seed: int, slot_seed: int, n_turns: int) -> list[dict]:
    """Turns of a base conversation — pure function of the two seeds."""
    rsk = np.random.default_rng(skeleton_seed)
    rsl = np.random.default_rng(slot_seed)
    # role pattern: turn 0 user, then a seeded cycle over user/assistant/tool
    pattern = ["user", "assistant"] if rsk.random() < 0.5 else ["user", "assistant", "tool"]
    turns = []
    for t in range(n_turns):
        role = "user" if t == 0 else pattern[t % len(pattern)]
        if role == "user":
            tpl = _USER_TPL[int(rsk.integers(0, len(_USER_TPL)))]
        elif role == "assistant":
            tpl = _ASSISTANT_TPL[int(rsk.integers(0, len(_ASSISTANT_TPL)))]
        else:
            tpl = _TOOL_TPL[int(rsk.integers(0, len(_TOOL_TPL)))]
        text = tpl.format(
            name=_NAMES[int(rsl.integers(0, len(_NAMES)))],
            path=_PATHS[int(rsl.integers(0, len(_PATHS)))],
            city=_CITIES[int(rsl.integers(0, len(_CITIES)))],
            num=int(rsl.integers(2, 9000)),
        )
        tool = _TOOLS[int(rsk.integers(0, len(_TOOLS)))] if role == "tool" else None
        turns.append(dict(turn_idx=t, role=role, text=text, tool=tool))
    return turns


def _corrupt_near(turns: list[dict], corruption_seed: int) -> list[dict]:
    """<=2 token substitutions per turn on <=30% of turns + ws/case/punct jitter."""
    rc = np.random.default_rng(corruption_seed)
    out = []
    n_perturb = max(1, int(len(turns) * 0.3))
    chosen = set(rc.choice(len(turns), size=n_perturb, replace=False).tolist())
    for t in turns:
        t = dict(t)
        if t["turn_idx"] in chosen:
            toks = t["text"].split(" ")
            subbable = [i for i, w in enumerate(toks) if w.strip(".,;:!?") in _SUBS]
            for i in subbable[: int(rc.integers(1, 3))]:
                w = toks[i]
                core = w.strip(".,;:!?")
                toks[i] = w.replace(core, _SUBS[core])
            text = " ".join(toks)
            jit = rc.random()
            if jit < 0.33:
                text = text.replace(".", "!", 1)  # punctuation swap
            elif jit < 0.66:
                text = text.replace(" ", "  ", 1)  # whitespace jitter
            else:
                text = text[:1].upper() + text[1:]  # case jitter
            t["text"] = text
        out.append(t)
    return out


def _corrupt_structural(turns: list[dict], corruption_seed: int) -> list[dict]:
    """Drop or duplicate one non-initial turn; re-pack turn_idx."""
    rc = np.random.default_rng(corruption_seed)
    turns = [dict(t) for t in turns]
    victim = int(rc.integers(1, len(turns)))
    if rc.random() < 0.5 and len(turns) > 3:
        del turns[victim]
    else:
        turns.insert(victim + 1, dict(turns[victim]))
    for i, t in enumerate(turns):
        t["turn_idx"] = i
    return turns


def _materialize_partition(pdf_iter):
    """mapInPandas worker: plan rows -> transcript turns (pure per-row)."""
    for pdf in pdf_iter:
        frames = []
        for row in pdf.itertuples(index=False):
            turns = _gen_base_turns(row.skeleton_seed, row.slot_seed, row.n_turns)
            if row.dup_class == "near":
                turns = _corrupt_near(turns, row.corruption_seed)
            elif row.dup_class == "structural":
                turns = _corrupt_structural(turns, row.corruption_seed)
            f = pd.DataFrame(turns)
            f["conv_id"] = row.conv_id
            f["ts"] = pd.Timestamp(BASE_TS) + pd.to_timedelta(
                row.conv_offset_s + 30 * f["turn_idx"], unit="s"
            )
            frames.append(f[["conv_id", "turn_idx", "role", "text", "tool", "ts"]])
        if frames:
            yield pd.concat(frames, ignore_index=True)


# ------------------------------------------------------------------ public API


def transcripts(spark: SparkSession, n_conv: int = 200, seed: int = SEED) -> DataFrame:
    """Distributed materialization of the transcript fixture."""
    plan = build_plan(n_conv, seed)
    plan_df = spark.createDataFrame(plan)
    # Partition by conversation so generation scales horizontally; at
    # 10^12 turns the plan itself would be generated distributed from
    # spark.range — the per-row purity makes that a drop-in change.
    n_parts = max(8, min(256, len(plan) // 64 or 8))
    out = plan_df.repartition(n_parts, "conv_id").mapInPandas(
        _materialize_partition, schema=schemas.TRANSCRIPTS
    )
    return out


def expected_clusters(spark: SparkSession, n_conv: int = 200, seed: int = SEED) -> DataFrame:
    plan = build_plan(n_conv, seed)
    pdf = plan[["conv_id", "cluster_seed_id"]].rename(columns={"cluster_seed_id": "cluster_id"})
    return spark.createDataFrame(pdf, schema=schemas.EXPECTED_CLUSTERS)


def labeled_pairs(spark: SparkSession, n_conv: int = 200, seed: int = SEED) -> DataFrame:
    """Ground-truth pairs: all within-cluster positives, hard negatives,
    and >=3x seeded random negatives (FIXTURES.md §2)."""
    plan = build_plan(n_conv, seed)
    rng = np.random.default_rng(seed + 1)

    rows = []
    seen: set[tuple[str, str]] = set()

    def add(a: str, b: str, is_dup: bool, cls: str) -> bool:
        a, b = (a, b) if a < b else (b, a)
        if (a, b) in seen:
            return False
        seen.add((a, b))
        rows.append((a, b, is_dup, cls))
        return True

    # positives: all within-cluster pairs (transitive closure of injection)
    for _, grp in plan.groupby("cluster_seed_id"):
        ids = sorted(grp["conv_id"])
        if len(ids) < 2:
            continue
        cls = dict(zip(grp["conv_id"], grp["dup_class"]))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                add(a, b, True, cls.get(b) if cls.get(b) != "base" else cls.get(a))
    n_pos = len(rows)

    # hard negatives: skeleton-sharing pairs
    hn = plan[plan["hardneg_partner"].notna()]
    for r in hn.itertuples(index=False):
        add(r.conv_id, r.hardneg_partner, False, "hardneg")

    # random negatives: seeded sample of distinct cross-cluster pairs,
    # >= 3x the positive count
    all_ids = plan["conv_id"].to_numpy()
    cluster_of = dict(zip(plan["conv_id"], plan["cluster_seed_id"]))
    need = 3 * n_pos
    got = 0
    while got < need:
        a, b = all_ids[rng.integers(0, len(all_ids))], all_ids[rng.integers(0, len(all_ids))]
        if a == b or cluster_of[a] == cluster_of[b]:
            continue
        if add(a, b, False, "random_neg"):
            got += 1

    pdf = pd.DataFrame(rows, columns=["conv_id_a", "conv_id_b", "is_dup", "dup_class"])
    return spark.createDataFrame(pdf, schema=schemas.LABELED_PAIRS)


def linkage_sources(
    spark: SparkSession, n_conv: int = 200, seed: int = SEED
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Two-source record-linkage fixture for ``pipeline.link``:
    (probe, registry, truth_links).

    The self-dedup plan is split by duplicate class: the *registry* side
    holds every base conversation (cluster seeds, plain singletons, and
    one member of each hard-negative pair); the *probe* side holds every
    injected copy (exact/near/structural) PLUS the other member of each
    hard-negative pair — same-skeleton texts whose true match is absent
    from the registry, the classic unlinkable-probe trap. Ground truth:
    each copy links to its cluster seed; hard-negative probes link to
    nothing. Truth is exhaustive (every probe's true link is known), so
    linkage F1 is computed over ALL predictions, no pair sampling.
    """
    plan = build_plan(n_conv, seed)
    is_copy = plan["dup_class"] != "base"
    is_hn_probe = plan["hardneg_partner"].isna() & plan["is_hardneg"] & ~is_copy
    probe_ids = plan.loc[is_copy | is_hn_probe, ["conv_id"]]
    registry_ids = plan.loc[~(is_copy | is_hn_probe), ["conv_id"]]

    tr = transcripts(spark, n_conv, seed)
    probe = tr.join(
        F.broadcast(spark.createDataFrame(probe_ids)), "conv_id", "left_semi"
    )
    registry = tr.join(
        F.broadcast(spark.createDataFrame(registry_ids)), "conv_id", "left_semi"
    )
    truth = spark.createDataFrame(
        plan.loc[is_copy, ["conv_id", "cluster_seed_id"]].rename(
            columns={"conv_id": "conv_id_a", "cluster_seed_id": "conv_id_b"}
        )
    )
    return probe, registry, truth
