"""Politeness scheduler: the Window-rank priority queue (north_rule O1+O2).

The reference rate-limits with per-request sleeps —
``time.sleep(randrange(a,b))`` (reference: core/spider.py:251-263,
spiders/bilibili/spiders.py:427, spiders/xhs/spiders.py:118).  On a cluster,
politeness is a *budget*, not a wall-clock sleep: each round fetches at most
``budget_per_round`` URLs per host, picked by

    row_number() OVER (PARTITION BY host
                       ORDER BY priority, discovery_round, canonical_url)

The deterministic tiebreak reproduces the reference's sequential FIFO order
per source (ascending page_no / cursor-chain order emerge naturally because
a successor is always discovered one round after its parent).

Skew (SURVEY §4.4 — a single hot API host can dominate the frontier): the
salted two-phase variant first ranks within (host, salt) sub-partitions so
no single task sorts the whole hot host, keeps the per-salt top ``budget``,
then runs the exact window over that ≤ salt_n × budget survivor set per
host.  Identical output, bounded per-task work at any skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ["priority", "discovery_round", "canonical_url"]


_DIS_RE = r"(?i)^disallow:\s*(\S+)"
_DELAY_RE = r"(?i)^crawl-delay:\s*([0-9.]+)"


def _robots_matched_lines(
    df: DataFrame, host_col: str, body_col: str, agent: str
) -> DataFrame:
    """Lines of the agent-matching robots group(s), one row per line.

    RFC 9309 group semantics: CONSECUTIVE ``User-agent`` lines form ONE
    group and the group's rules attach to every agent named in the run
    ('User-agent: *' + 'User-agent: googlebot' stacked share the rules).
    A section therefore starts only at a UA line whose predecessor is not
    a UA line, and a section matches when ANY of its UA lines equals
    ``agent``.  Multiple matching groups per host all contribute rows,
    which is the RFC's "join the rules of groups" merge.
    """
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("i", "line"),
    ).withColumn("line", F.trim(F.regexp_replace("line", "#.*$", "")))
    ua = F.regexp_extract("line", r"(?i)^user-agent:\s*(\S+)", 1)
    lines = lines.withColumn("_is_ua", (ua != "").cast("int")).withColumn(
        "_ua", ua
    )
    w = Window.partitionBy("host").orderBy("i")
    new_sec = (
        (F.col("_is_ua") == 1) & (F.lag("_is_ua", 1, 0).over(w) == 0)
    ).cast("int")
    lines = lines.withColumn("section", F.sum(new_sec).over(w))
    wsec = Window.partitionBy("host", "section")
    matched = F.max(
        (F.lower(F.col("_ua")) == agent.lower()).cast("int")
    ).over(wsec)
    return lines.withColumn("_m", matched).filter(
        (F.col("_m") == 1) & (F.col("section") > 0)
    ).drop("_is_ua", "_m")


def parse_robots_txt(
    df: DataFrame, host_col: str = "host", body_col: str = "body",
    agent: str = "*",
) -> DataFrame:
    """robots.txt text -> one rule row per (host, Disallow path) for the
    matching User-agent group(s), plus the host's Crawl-delay.

    Pure Catalyst: posexplode the lines, assign each line to its
    User-agent group with a lag+running-sum window (consecutive UA lines
    = one group, per RFC 9309), keep groups naming ``agent``.  Feeds
    :func:`robots_gate` after a groupBy collect (see
    :func:`robots_table_from_bodies`).  The reference has no robots
    support at all — this is north_star surface ("robots.txt gate").
    """
    star = _robots_matched_lines(df, host_col, body_col, agent)
    dis = F.regexp_extract("line", _DIS_RE, 1)
    delay = F.regexp_extract("line", _DELAY_RE, 1)
    rules = star.select(
        "host",
        F.col("i").alias("rule_idx"),
        dis.alias("path"),
        F.max(F.nullif(delay, F.lit("")).cast("double")).over(
            Window.partitionBy("host")
        ).alias("crawl_delay"),
    ).filter(F.col("path") != "")
    return rules


def robots_table_from_bodies(
    df: DataFrame, host_col: str = "host", body_col: str = "body",
    agent: str = "*",
) -> DataFrame:
    """Collapse parsed rules to the ROBOTS gate schema
    (host, disallow array<string> in file order, crawl_delay).

    crawl_delay is aggregated independently of the disallow rows, so a
    host whose matching group has a Crawl-delay but no Disallow rules
    still gets a robots row (empty disallow array) instead of vanishing.
    """
    star = _robots_matched_lines(df, host_col, body_col, agent)
    dis = F.regexp_extract("line", _DIS_RE, 1)
    delay = F.regexp_extract("line", _DELAY_RE, 1)
    return (
        star.groupBy("host")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            dis != "",
                            F.struct(
                                F.col("i").alias("rule_idx"),
                                dis.alias("path"),
                            ),
                        )
                    )
                ),
                lambda s: s["path"],
            ).alias("disallow"),
            F.max(F.nullif(delay, F.lit("")).cast("double")).alias(
                "crawl_delay"
            ),
        )
    )


def robots_gate(frontier: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Drop URLs whose path matches a disallow prefix for their host.

    robots is a small dimension -> broadcast join, never a shuffle of the
    frontier (SURVEY §2.4 host-key operations).
    """
    if robots is None:
        return frontier
    from spiders_for_all_spark.functions.text import let

    path = F.regexp_extract(
        F.col("canonical_url"), r"^[a-z]+://[^/?#]*([^?#]*)", 1
    )
    joined = frontier.join(
        F.broadcast(robots.select("host", "disallow")), on="host", how="left"
    )
    # let-bind the extracted path: referenced inside the exists() lambda,
    # the regexp would otherwise re-run once per disallow rule per URL
    blocked = let(
        path,
        lambda p: F.exists(F.col("disallow"), lambda d: F.startswith(p, d)),
    )
    return joined.filter(~F.coalesce(blocked, F.lit(False))).drop("disallow")


def _with_budget(frontier: DataFrame, host_budget: DataFrame | None,
                 default_budget: int) -> DataFrame:
    if host_budget is None:
        return frontier.withColumn("budget", F.lit(default_budget))
    j = frontier.join(
        F.broadcast(host_budget.select("host", "budget_per_round")),
        on="host",
        how="left",
    )
    return j.withColumn(
        "budget", F.coalesce(F.col("budget_per_round"), F.lit(default_budget))
    ).drop("budget_per_round")


def schedule_round(
    frontier: DataFrame,
    host_budget: DataFrame | None = None,
    default_budget: int = 2,
    salt_n: int = 1,
) -> DataFrame:
    """Pick this round's fetch set: top-``budget`` per host in priority order.

    Salting is **adaptive per host**: a ``host_budget`` row with
    ``salt_n > 1`` routes that host through a bounded two-phase pre-rank
    (phase 1 within ``(host, salt)`` slices kills the hot-host straggler —
    the bilibili single-API-host pattern), while every other host goes
    straight to the single final window.  Cold rows therefore shuffle
    ONCE, not twice — at 10^10 frontier rows with one hot host, the old
    global-salt plan paid a full extra exchange+sort on ~100% of rows to
    protect <1% of them.  The global ``salt_n`` argument remains the
    default for hosts without a ``host_budget`` row.

    Salting is result-invariant: each salt slice keeps its own top-budget,
    a superset of the host's global top-budget, so the final window
    returns exactly the unsalted result (golden-tested).
    """
    wb = _with_budget(frontier, host_budget, default_budget)

    def pre_rank(df: DataFrame, salt_expr) -> DataFrame:
        w1 = Window.partitionBy("host", salt_expr).orderBy(*ORDER_COLS)
        return (
            df.withColumn("_pre_rank", F.row_number().over(w1))
            .filter(F.col("_pre_rank") <= F.col("budget"))
            .drop("_pre_rank")
        )

    if host_budget is not None and "salt_n" in host_budget.columns:
        # per-host: only rows of salted hosts take the two-phase path
        wb = wb.join(
            F.broadcast(host_budget.select("host", "salt_n")), on="host", how="left"
        ).withColumn(
            "_salt_n", F.coalesce(F.col("salt_n"), F.lit(salt_n))
        ).drop("salt_n")
        hot = pre_rank(
            wb.filter(F.col("_salt_n") > 1),
            F.pmod(F.col("url_hash"), F.col("_salt_n")),
        )
        wb = wb.filter(F.col("_salt_n") <= 1).unionByName(hot).drop("_salt_n")
    elif salt_n > 1:
        wb = pre_rank(wb, F.pmod(F.col("url_hash"), F.lit(salt_n)))

    w = Window.partitionBy("host").orderBy(*ORDER_COLS)
    return (
        wb.withColumn("sched_rank", F.row_number().over(w))
        .filter(F.col("sched_rank") <= F.col("budget"))
        .drop("budget")
    )


def apportion_budget(
    frontier: DataFrame,
    total: int,
    key_col: str = "host",
    weight_col: str | None = None,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer crawl
    budget across hosts: each host gets ``floor(weight * total / W)``
    slots, then the ``total - sum(floors)`` leftover slots go one each to
    the hosts with the largest remainders (ties -> key ascending).
    Weight defaults to the host's pending-URL count; pass ``weight_col``
    to apportion on any integer signal (link-rank mass, past success
    counts).  Returns ``(key, n_pending, budget)`` with
    ``sum(budget) == total`` exactly and every host within 1 slot of its
    exact proportional share — the fleet-wide fetch-slot split a crawl
    coordinator hands to per-host politeness queues each round (alias
    ``budget`` to ``budget_per_round`` to feed schedule_round's
    ``host_budget`` input).

    Everything is INTEGER arithmetic end-to-end ((w * total) div W /
    mod W — never a float share), so the allocation is bit-identical on
    any engine or partition layout, the same invariant the A1 metrics
    and mixture_resample keep.  Plan shape: ONE partial-aggregatable
    groupBy over the frontier; every window after it runs over #hosts
    rows (thousands), not frontier rows — at a 10^10-row frontier the
    apportionment itself costs one count-shuffle.  The reference has no
    cross-host budget at all (one in-flight request globally,
    core/spider.py:251-263).
    """
    if weight_col is None:
        counts = frontier.groupBy(key_col).agg(
            F.count("*").alias("n_pending")
        )
    else:
        counts = frontier.groupBy(key_col).agg(
            F.sum(weight_col).cast("bigint").alias("n_pending")
        )
    w_all = Window.partitionBy()
    q = (
        counts.withColumn("_W", F.sum("n_pending").over(w_all))
        .withColumn("_base", F.expr(f"(n_pending * {int(total)}) div _W"))
        .withColumn("_rem", F.expr(f"(n_pending * {int(total)}) % _W"))
    )
    q = q.withColumn("_K", F.lit(int(total)) - F.sum("_base").over(w_all))
    rn = F.row_number().over(
        Window.partitionBy().orderBy(F.desc("_rem"), F.col(key_col))
    )
    return (
        q.withColumn("_rn", rn)
        .select(
            key_col,
            "n_pending",
            (
                F.col("_base")
                + F.when(F.col("_rn") <= F.col("_K"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("budget"),
        )
    )
