"""HttpFetcher client-config parity (reference core/client.py:86,100-117,
142-177): per-request UA + proxy merge and session-level cookies — pure
helpers unit-tested with a stub session, no network, no Spark."""

from __future__ import annotations

from spiders_for_all_spark.sources.fetcher import (
    HttpFetcher,
    _http_request_kwargs,
    _install_cookies,
)


def test_request_kwargs_merges_ua_timeout_proxies():
    kw = _http_request_kwargs(
        "agent/1.0", 7.5, {"http": "http://proxy:8080"}
    )
    assert kw == {
        "timeout": 7.5,
        "headers": {"User-Agent": "agent/1.0"},
        "proxies": {"http": "http://proxy:8080"},
    }
    # no proxies configured -> key absent (requests falls back to env)
    assert "proxies" not in _http_request_kwargs("agent/1.0", 7.5, None)
    assert "proxies" not in _http_request_kwargs("agent/1.0", 7.5, {})


def test_request_kwargs_copies_proxies():
    """The per-request dict must be a copy — a worker mutating one request's
    kwargs must not leak into the shared config."""
    shared = {"http": "http://proxy:8080"}
    kw = _http_request_kwargs("a", 1.0, shared)
    kw["proxies"]["http"] = "mutated"
    assert shared["http"] == "http://proxy:8080"


class _StubCookies(dict):
    def update(self, other):  # mimic RequestsCookieJar.update
        dict.update(self, other)


class _StubSession:
    def __init__(self):
        self.cookies = _StubCookies()


def test_install_cookies_on_session():
    s = _StubSession()
    _install_cookies(s, {"SESSDATA": "tok", "buvid3": "x"})
    assert dict(s.cookies) == {"SESSDATA": "tok", "buvid3": "x"}
    # None / empty leave the jar untouched
    s2 = _StubSession()
    _install_cookies(s2, None)
    _install_cookies(s2, {})
    assert dict(s2.cookies) == {}


def test_http_fetcher_stores_copies():
    proxies = {"https": "http://p:1"}
    cookies = {"k": "v"}
    f = HttpFetcher(proxies=proxies, cookies=cookies)
    proxies["https"] = "mutated"
    cookies["k"] = "mutated"
    assert f.proxies == {"https": "http://p:1"}
    assert f.cookies == {"k": "v"}
    assert HttpFetcher().proxies is None and HttpFetcher().cookies is None
