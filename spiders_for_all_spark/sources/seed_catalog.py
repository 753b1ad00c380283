"""Declarative named-spider seed catalog (S3 breadth parity).

The reference ships ~27 fixed-endpoint spiders a user invokes by NAME or
Chinese ALIAS — every subclass auto-registers under both keys in a
process-global registry (reference: core/spider.py:122-131) and the CLI
resolves either (`python -m spiders_for_all bilibili crawl 综合热门`).
The endpoints are constants on the classes
(spiders/bilibili/spiders.py:79-398).

Here the same surface is ONE declarative table: entry -> frontier seed
rows, consumed by ``cli.py crawl --spider <name-or-alias>`` and by the
``s3_spider_seed_catalog`` catalog query.  Paginated endpoints
(PageSpider subclasses: popular, precious) seed the engine's ``page=1 &
size=N`` convention so the round loop emits page+1 successors while pages
stay full (operators/frontier.py:successors); single-shot rank endpoints
(SearchSpider subclasses) seed one page-kind row with no pagination
params — fetched and parsed exactly once, the reference's one-request
search semantics.  Parameterized spiders (author/feed/comment/search need
a uid, note id, or keyword) are deliberately NOT catalog rows — they come
in through ``--seeds`` / the download verbs, like the reference's
kwargs-driven spiders.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class SpiderSeed:
    """One named fixed-endpoint spider (reference class -> seed row)."""

    name: str
    alias: str
    platform: str
    api: str
    paginated: bool = False
    page_size: int = 20

    @property
    def seed_url(self) -> str:
        if not self.paginated:
            return self.api
        sep = "&" if "?" in self.api else "?"
        return f"{self.api}{sep}page=1&size={self.page_size}"

    def seed_row(self) -> dict:
        return {"url": self.seed_url, "priority": 0, "kind": "page"}


def _rank(name: str, alias: str, url: str) -> SpiderSeed:
    return SpiderSeed(name=name, alias=alias, platform="bilibili", api=url)


_V2 = "https://api.bilibili.com/x/web-interface/ranking/v2"
_PGC_RANK = "https://api.bilibili.com/pgc/web/rank/list"
_PGC_SEASON = "https://api.bilibili.com/pgc/season/rank/web/list"

# One row per reference spider class, same endpoint constants
# (spiders/bilibili/spiders.py:79-398; the commented-out WeeklySpider is
# excluded there too).
SPIDER_SEEDS: tuple[SpiderSeed, ...] = (
    SpiderSeed(
        name="popular", alias="综合热门", platform="bilibili",
        api="https://api.bilibili.com/x/web-interface/popular",
        paginated=True, page_size=20,
    ),
    SpiderSeed(
        name="precious", alias="入站必刷", platform="bilibili",
        api="https://api.bilibili.com/x/web-interface/popular/precious",
        paginated=True, page_size=100,
    ),
    _rank("rank_all", "全站", f"{_V2}?rid=0&type=all"),
    _rank("rank_drama", "番剧", f"{_PGC_RANK}?day=3&season_type=1"),
    _rank("rank_cn_cartoon", "国产动画", f"{_PGC_SEASON}?day=3&season_type=4"),
    _rank("rank_cn_related", "国创相关", f"{_V2}?rid=168&type=all"),
    _rank("rank_documentary", "纪录片", f"{_PGC_SEASON}?day=3&season_type=3"),
    _rank("rank_cartoon", "动画", f"{_V2}?rid=1&type=all"),
    _rank("rank_music", "音乐", f"{_V2}?rid=3&type=all"),
    _rank("rank_dance", "舞蹈", f"{_V2}?rid=129&type=all"),
    _rank("rank_game", "游戏", f"{_V2}?rid=4&type=all"),
    _rank("rank_tech", "科技", f"{_V2}?rid=188&type=all"),
    _rank("rank_knowledge", "知识", f"{_V2}?rid=36&type=all"),
    _rank("rank_sport", "运动", f"{_V2}?rid=234&type=all"),
    _rank("rank_car", "汽车", f"{_V2}?rid=223&type=all"),
    _rank("rank_life", "生活", f"{_V2}?rid=160&type=all"),
    _rank("rank_food", "美食", f"{_V2}?rid=211&type=all"),
    _rank("rank_animal", "动物圈", f"{_V2}?rid=217&type=all"),
    _rank("rank_auto_tune", "鬼畜", f"{_V2}?rid=119&type=all"),
    _rank("rank_fashion", "时尚", f"{_V2}?rid=155&type=all"),
    _rank("rank_ent", "娱乐", f"{_V2}?rid=5&type=all"),
    _rank("rank_film", "影视", f"{_V2}?rid=181&type=all"),
    _rank("rank_movie", "电影", f"{_PGC_SEASON}?day=3&season_type=2"),
    _rank("rank_tv", "电视剧", f"{_PGC_SEASON}?day=3&season_type=5"),
    _rank("rank_variety", "综艺", f"{_PGC_SEASON}?day=3&season_type=7"),
    _rank("rank_origin", "原创", f"{_V2}?rid=0&type=origin"),
    _rank("rank_new", "新人", f"{_V2}?rid=0&type=rookie"),
)

# Registered under BOTH name and alias, mirroring __init_subclass__
# (core/spider.py:122-131) — lookup accepts either key.
REGISTRY: dict[str, SpiderSeed] = {}
for _s in SPIDER_SEEDS:
    REGISTRY[_s.name] = _s
    REGISTRY[_s.alias] = _s


def lookup(key: str) -> SpiderSeed:
    try:
        return REGISTRY[key]
    except KeyError:
        names = ", ".join(s.name for s in SPIDER_SEEDS)
        raise KeyError(
            f"unknown spider {key!r}; known names/aliases: {names}"
        ) from None


def seeds_for(keys: list[str]) -> list[dict]:
    """Seed rows for ``seeds_to_frontier``, de-duplicated in key order
    (naming a spider by both name and alias seeds it once)."""
    out: list[dict] = []
    seen: set[str] = set()
    for k in keys:
        s = lookup(k)
        if s.name not in seen:
            seen.add(s.name)
            out.append(s.seed_row())
    return out
