"""Declarative rule registry — the analog of the reference's detector
registry (/root/reference .../detect_pitfalls_main.py:262-290).

Each rule is a pure per-row predicate. The reference implements them as 27
hard-coded Python functions walking nested dicts; here each rule carries

* ``spark``  — a builder returning a native ``Column`` boolean (whole-stage
  codegen, zero Python in the hot path), parameterized on the caption
  column so the same rules run over any text column;
* ``py``     — the pure-Python oracle predicate (same shared pattern
  constants) used to produce golden keep/drop labels for pytest parity
  (BASELINE.json: F1 >= 0.99 vs reference labels);
* ``duckdb`` — a boolean SQL expression template (``{c}`` = column name)
  for the driver's DuckDB oracle where the pattern is RE2-expressible.

Registry order is semantic: the reference's summary arrays and per-repo
``checks`` arrays follow registry order (detect_pitfalls_main.py:306-311),
so ``rule_hits`` arrays here are ordered by ``rank``.

Rules requiring relational context (URL-status broadcast join — P013/P025,
reference p013.py/p025.py) or binary decode (P001/P019/X001) set
``kind`` accordingly and are wired in pipeline.py; their ``py`` oracle
takes the shared context dict.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from metacheck_spark.functions import patterns as P
from metacheck_spark.functions.urlcheck import extract_urls as _urls_py
from metacheck_spark.functions.urlcheck import url_flags_one

# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Rule:
    code: str
    severity: str  # 'P' = pitfall (drop), 'W' = warning (record only)
    category: str
    description: str
    kind: str  # 'text' | 'binary' | 'url'
    spark: Optional[Callable[[Column], Column]] = None  # caption col -> bool col
    py: Optional[Callable] = None  # (caption:str|None, ctx:dict) -> bool
    duckdb: Optional[str] = None  # boolean SQL over {c}, RE2-safe
    rank: int = field(default=-1)


def _rx(pattern: str):
    """Compile once; Python-side oracle predicate for an rlike analog."""
    cre = re.compile(pattern)
    return lambda s: s is not None and cre.search(s) is not None


def _not_null_text(c: Column) -> Column:
    return c.isNotNull()


# --- text rules ------------------------------------------------------------

def _p002_spark(c: Column) -> Column:
    return c.rlike(P.P002_PLACEHOLDER)


_p002_py = _rx(P.P002_PLACEHOLDER)


def _p005_spark(c: Column) -> Column:
    return c.rlike(P.P005_MULTI_AUTHOR)


_p005_py = _rx(P.P005_MULTI_AUTHOR)


def _p006_spark(c: Column) -> Column:
    return c.rlike(P.P006_HOMEPAGE_DOC_URL)


_p006_py = _rx(P.P006_HOMEPAGE_DOC_URL)


def _p007_spark(c: Column) -> Column:
    return c.rlike(P.P007_ARCHIVE_URL)


_p007_py = _rx(P.P007_ARCHIVE_URL)


def _p008_spark(c: Column) -> Column:
    return c.rlike(P.P008_LOCAL_LICENSE_PATH)


_p008_py = _rx(P.P008_LOCAL_LICENSE_PATH)


def _p011_spark(c: Column) -> Column:
    # intra-row correlation: cite marker AND a URL present AND no DOI anywhere
    # (reference p011.py correlates three categories within one document)
    return (
        c.rlike(P.P011_CITE_MARKER)
        & c.rlike(P.URL_EXTRACT)
        & ~c.rlike(P.DOI_ANYWHERE)
    )


_cite = _rx(P.P011_CITE_MARKER)
_url = _rx(P.URL_EXTRACT)
_doi = _rx(P.DOI_ANYWHERE)


def _p011_py(s):
    return _cite(s) and _url(s) and not _doi(s)


def _p016_spark(c: Column) -> Column:
    return c.rlike(P.P016_HOMEPAGE_URL) & ~c.rlike(P.REPO_HOST)


_home = _rx(P.P016_HOMEPAGE_URL)
_repo = _rx(P.REPO_HOST)


def _p016_py(s):
    return _home(s) and not _repo(s)


def _p017_spark(c: Column) -> Column:
    # copyright marker, no license term, and short text (reference p017.py:74
    # caps at <=10 non-blank lines; captions are one line -> <=10 tokens)
    return (
        c.rlike(P.P017_COPYRIGHT)
        & ~c.rlike(P.P017_LICENSE_TERM)
        & (F.size(F.split(F.trim(c), r"\s+")) <= 10)
    )


_cpy = _rx(P.P017_COPYRIGHT)
_lic = _rx(P.P017_LICENSE_TERM)


def _p017_py(s):
    return (
        s is not None
        and _cpy(s)
        and not _lic(s)
        and len(re.split(r"\s+", s.strip())) <= 10
    )


def _p018_spark(c: Column) -> Column:
    return c.rlike(P.P018_NEWLINE) | (c != F.trim(c)) | c.contains("  ")


_nl = _rx(P.P018_NEWLINE)


def _p018_py(s):
    return s is not None and (_nl(s) or s != s.strip() or "  " in s)


def _p020_spark(c: Column) -> Column:
    return c.rlike(P.P020_BARE_URL)


_p020_py = _rx(P.P020_BARE_URL)


def _p022_spark(c: Column) -> Column:
    cond = F.lit(False)
    for present, versioned in P.P022_FAMILIES:
        cond = cond | (c.rlike(present) & ~c.rlike(versioned))
    return cond


_p022_pairs = [(_rx(a), _rx(b)) for a, b in P.P022_FAMILIES]


def _p022_py(s):
    return any(p(s) and not v(s) for p, v in _p022_pairs)


def _p023_spark(c: Column) -> Column:
    return c.rlike(P.P023_GIT_SHORTHAND) & ~c.rlike(r"(?i)https?://")


_short = _rx(P.P023_GIT_SHORTHAND)
_http = _rx(r"(?i)https?://")


def _p023_py(s):
    return _short(s) and not _http(s)


def _p024_spark(c: Column) -> Column:
    return c.rlike(P.P024_BARE_DOI) & ~c.rlike(P.DOI_URL)


_bare_doi = _rx(P.P024_BARE_DOI)
_doi_url = _rx(P.DOI_URL)


def _p024_py(s):
    return _bare_doi(s) and not _doi_url(s)


def _p028_spark(c: Column) -> Column:
    return c.rlike(P.P028_SWHID)


_p028_py = _rx(P.P028_SWHID)


def _w003_spark(c: Column) -> Column:
    return c.rlike(P.W003_REQUIRES) & ~c.rlike(P.W003_REQUIRES_VERSIONED)


_req = _rx(P.W003_REQUIRES)
_req_v = _rx(P.W003_REQUIRES_VERSIONED)


def _w003_py(s):
    return _req(s) and not _req_v(s)


def _extract_date(c: Column, marker_pattern: str) -> Column:
    """First marker-tagged datetime, parsed via the 5 accepted formats
    (reference w004.py:58-92) — coalesce(to_timestamp(fmt)...)."""
    raw = F.regexp_extract(c, marker_pattern, 1)
    attempts = [
        F.try_to_timestamp(raw, F.lit(spark_fmt)) for spark_fmt, _ in P.DATE_FORMATS
    ]
    return F.coalesce(*attempts)


def _w004_spark(c: Column) -> Column:
    upd = _extract_date(c, P.W004_UPDATED)
    mod = _extract_date(c, P.W004_MODIFIED)
    return upd.isNotNull() & mod.isNotNull() & (F.datediff(upd, mod) > 1)


_upd_re = re.compile(P.W004_UPDATED)
_mod_re = re.compile(P.W004_MODIFIED)


def _parse_date_py(raw: str):
    from datetime import datetime

    for _, py_fmt in P.DATE_FORMATS:
        try:
            return datetime.strptime(raw, py_fmt)
        except ValueError:
            continue
    return None


def _w004_py(s):
    if s is None:
        return False
    mu, mm = _upd_re.search(s), _mod_re.search(s)
    if not mu or not mm:
        return False
    du, dm = _parse_date_py(mu.group(1)), _parse_date_py(mm.group(1))
    # datediff() compares dates, not instants — mirror that exactly
    return du is not None and dm is not None and (du.date() - dm.date()).days > 1


def _w010_spark(c: Column) -> Column:
    return c.rlike(P.W010_LANG) & ~c.rlike(P.W010_LANG_VERSIONED)


_lang = _rx(P.W010_LANG)
_lang_v = _rx(P.W010_LANG_VERSIONED)


def _w010_py(s):
    return _lang(s) and not _lang_v(s)


def _w012_spark(c: Column) -> Column:
    return c.rlike(P.W012_MULTI_DEP)


_w012_py = _rx(P.W012_MULTI_DEP)


def _w014_spark(c: Column) -> Column:
    return c.rlike(P.W014_NAME_ID) & (c.rlike(P.DOI_ANYWHERE) | c.rlike(P.DOI_URL))


_name_id = _rx(P.W014_NAME_ID)


def _w014_py(s):
    return _name_id(s) and (_doi(s) or _doi_url(s))


def _w015_spark(c: Column) -> Column:
    return c.isNull() | (F.trim(c) == "")


def _w015_py(s):
    return s is None or s.strip() == ""


def _w021_spark(c: Column) -> Column:
    return c.rlike(P.W021_BRACKET_LIST)


_w021_py = _rx(P.W021_BRACKET_LIST)


# --- binary / relational rule oracles (Spark side lives in pipeline.py) ----

def _p001_py(_s, ctx):
    """Declared w/h column vs dims parsed from the image header bytes
    (analog of version-vs-release mismatch, reference p001.py:65-94).
    Header parse is byte-offset arithmetic — mirrored natively in Spark via
    substring()/conv() on the binary column (see pipeline.binary_rule_cols)."""
    hdr = ctx.get("hdr_dims")  # (w, h) or None when unparseable
    if hdr is None:
        return False
    return hdr != (ctx["w"], ctx["h"])


def _p019_py(_s, ctx):
    """Stored phash vs phash recomputed from decoded pixels (analog of the
    download-url-version vs release-version mismatch, reference p019.py)."""
    ph = ctx.get("phash_calc")
    return ph is not None and ph != ctx["phash"]


def _p026_py(_s, ctx):
    """Declared fmt column vs magic-byte format (analog of declared
    code_repository vs GitHub_API repo mismatch, reference p026.py:27-82)."""
    magic = ctx.get("magic_fmt")
    return magic is not None and ctx["fmt"] is not None and magic != ctx["fmt"]


def _p027_py(s, _ctx=None):
    """Two version tokens that differ strictly but match after v-strip —
    preserves the reference quirk pair: P001 normalizes the leading 'v',
    P027 compares strictly (p027.py:84 vs pitfall_utils.py:63-71)."""
    if s is None:
        return False
    toks = re.findall(r"\bv?\d+\.\d+(?:\.\d+)?\b", s)
    if len(toks) < 2:
        return False
    strict = len(set(toks)) > 1
    normalized = len({t.lstrip("vV") for t in toks}) > 1
    return strict and not normalized


def _p027_spark(c: Column) -> Column:
    toks = F.regexp_extract_all(c, F.lit(r"\bv?\d+\.\d+(?:\.\d+)?\b"), 0)
    strict = F.size(F.array_distinct(toks)) > 1
    norm = F.size(
        F.array_distinct(F.transform(toks, lambda t: F.regexp_replace(t, "^[vV]", "")))
    ) > 1
    return (F.size(toks) >= 2) & strict & ~norm


def _p013_py(s, ctx):
    """URL inaccessible, 2xx OR 301 counts as accessible (reference
    p013.py:47 treats 301 as OK — quirk preserved vs P025)."""
    return url_flags_one(s, ctx["url_status"])[0]


def _p025_py(s, ctx):
    """URL not strictly 2xx (reference p025.py:40-41 rejects 301)."""
    return url_flags_one(s, ctx["url_status"])[1]


def _x001_py(_s, ctx):
    """Decode failure — engine extension (the reference's per-file parse
    isolation, detect_pitfalls_main.py:357-362, recast as a drop rule)."""
    return not ctx.get("decoded_ok", True)


# ---------------------------------------------------------------------------
# Registry, in the reference's registry order (detect_pitfalls_main.py:262-290)
# with the three engine extensions (X001 decode, X002 langid, X003 ppl) last.

_RULES = [
    Rule("P001", "P", "sanity", "declared w/h mismatch vs image header dims", "binary", py=_p001_py),
    Rule("P002", "P", "caption", "placeholder token in caption", "text", _p002_spark, lambda s, ctx=None: _p002_py(s),
         duckdb="regexp_matches(lower({c}), '(<year>|<program>|<name>|<owner>|<copyright holders?>|\\[year\\]|\\[fullname\\]|\\[name of copyright owner\\]|\\[yyyy\\])')"),
    Rule("W003", "W", "caption", "requirement named without version constraint", "text", _w003_spark, lambda s, ctx=None: _w003_py(s),
         duckdb="(regexp_matches(lower({c}), 'requires [a-z][a-z0-9_-]*') AND NOT regexp_matches(lower({c}), 'requires [a-z][a-z0-9_-]*\\s*(==|>=|<=|~=|!=|[><^~]|v?[0-9])'))"),
    Rule("W004", "W", "caption", "updated timestamp >1 day after modified", "text", _w004_spark, lambda s, ctx=None: _w004_py(s)),
    Rule("P005", "P", "caption", "multiple entities in credit segment", "text", _p005_spark, lambda s, ctx=None: _p005_py(s)),
    Rule("P006", "P", "caption", "documentation/homepage URL where content link belongs", "text", _p006_spark, lambda s, ctx=None: _p006_py(s),
         duckdb="regexp_matches(lower({c}), '(https?://|www\\.)[^ ]*(readthedocs\\.io|github\\.io|/wiki|docs\\.|documentation)')"),
    Rule("P007", "P", "caption", "software-archive URL in caption", "text", _p007_spark, lambda s, ctx=None: _p007_py(s),
         duckdb="regexp_matches(lower({c}), '(zenodo\\.org|figshare\\.com|sourceforge\\.net|archive\\.org|codeocean\\.com|osf\\.io|doi\\.org/10\\.5281|github\\.com/[^ ]+/releases)')"),
    Rule("P008", "P", "caption", "local license-file path where URL belongs", "text", _p008_spark, lambda s, ctx=None: _p008_py(s)),
    Rule("W010", "W", "caption", "language named without version", "text", _w010_spark, lambda s, ctx=None: _w010_py(s),
         duckdb="(regexp_matches(lower({c}), 'written in (python|java|rust|c\\+\\+|ruby|go)') AND NOT regexp_matches(lower({c}), 'written in (python|java|rust|c\\+\\+|ruby|go) v?[0-9]'))"),
    Rule("P011", "P", "caption", "citation requested, URL present, no DOI", "text", _p011_spark, lambda s, ctx=None: _p011_py(s)),
    Rule("W012", "W", "caption", "multiple requirements packed in one string", "text", _w012_spark, lambda s, ctx=None: _w012_py(s),
         duckdb="regexp_matches({c}, 'deps:\\s*[A-Z][A-Za-z0-9._-]*(\\s[A-Z][A-Za-z0-9._-]*)+')"),
    Rule("P013", "P", "url", "caption URL inaccessible (2xx∪301 accessible)", "url", py=_p013_py),
    Rule("W014", "W", "caption", "name-like identifier while valid DOI present", "text", _w014_spark, lambda s, ctx=None: _w014_py(s)),
    Rule("W015", "W", "caption", "caption empty or blank", "text", _w015_spark, lambda s, ctx=None: _w015_py(s),
         duckdb="({c} IS NULL OR trim({c}) = '')"),
    Rule("P016", "P", "caption", "homepage URL where repository link belongs", "text", _p016_spark, lambda s, ctx=None: _p016_py(s)),
    Rule("P017", "P", "caption", "copyright-only short caption", "text", _p017_spark, lambda s, ctx=None: _p017_py(s)),
    Rule("P018", "P", "caption", "malformed whitespace in caption", "text", _p018_spark, lambda s, ctx=None: _p018_py(s),
         duckdb="(regexp_matches({c}, '[\\n\\r]') OR {c} != trim({c}) OR contains({c}, '  '))"),
    Rule("P019", "P", "sanity", "stored phash mismatch vs recomputed phash", "binary", py=_p019_py),
    Rule("P020", "P", "caption", "caption is a bare URL", "text", _p020_spark, lambda s, ctx=None: _p020_py(s),
         duckdb="regexp_matches(lower({c}), '^\\s*(https?://|www\\.)[^ ]+\\s*$')"),
    Rule("W021", "W", "caption", "bracketed comma list in caption", "text", _w021_spark, lambda s, ctx=None: _w021_py(s),
         duckdb="regexp_matches({c}, '\\[[^\\]\\[]*,[^\\]\\[]*\\]')"),
    Rule("P022", "P", "caption", "license family named without version", "text", _p022_spark, lambda s, ctx=None: _p022_py(s)),
    Rule("P023", "P", "caption", "git-remote shorthand instead of URL", "text", _p023_spark, lambda s, ctx=None: _p023_py(s)),
    Rule("P024", "P", "caption", "bare DOI instead of doi.org URL", "text", _p024_spark, lambda s, ctx=None: _p024_py(s)),
    Rule("P025", "P", "url", "caption URL not strictly 2xx (301 rejected)", "url", py=_p025_py),
    Rule("P026", "P", "sanity", "declared fmt mismatch vs magic bytes", "binary", py=_p026_py),
    Rule("P027", "P", "caption", "version tokens differing only by v-prefix", "text", _p027_spark, _p027_py),
    Rule("P028", "P", "caption", "raw SWHID in caption", "text", _p028_spark, lambda s, ctx=None: _p028_py(s),
         duckdb="regexp_matches({c}, '(^| )swh:1:[a-z]{{3}}:[0-9a-f]{{40}}($|[ .,;])')"),
    Rule("X001", "P", "sanity", "image bytes fail to decode (engine extension)", "binary", py=_x001_py),
    # Model-stage rules (engine extensions; the north_star's fastText-style
    # langid + KenLM-style perplexity scorer as drop criteria). Evaluated
    # from the lang/conf/ppl columns the pandas-UDF stage produces; the
    # oracle computes the same columns with the identical batch functions.
    Rule("X002", "P", "model", "language unidentifiable (langid confidence below threshold)", "model",
         py=lambda _s, ctx: ctx["lang"] == "und"),
    Rule("X003", "P", "model", "caption log-perplexity above threshold", "model",
         py=lambda _s, ctx: ctx["ppl"] > ctx["ppl_threshold"]),
]

REGISTRY: list[Rule] = [
    Rule(r.code, r.severity, r.category, r.description, r.kind, r.spark, r.py, r.duckdb, rank=i)
    for i, r in enumerate(_RULES)
]

TEXT_RULES: list[Rule] = [r for r in REGISTRY if r.kind == "text"]
URL_RULES: list[Rule] = [r for r in REGISTRY if r.kind == "url"]
BINARY_RULES: list[Rule] = [r for r in REGISTRY if r.kind == "binary"]
MODEL_RULES: list[Rule] = [r for r in REGISTRY if r.kind == "model"]
# Rules whose predicate is RE2-expressible for the driver's DuckDB oracle
DUCKDB_SAFE: list[Rule] = [r for r in REGISTRY if r.duckdb is not None]

CODES = [r.code for r in REGISTRY]


def rule_dim_rows() -> list[tuple]:
    """Rows for the rule-metadata dimension table (schemas.RULE_DIM_SCHEMA) —
    the analog of the reference's code->description/category mapping
    (json_ld_utils.py:54-88,318-353)."""
    return [(r.code, r.severity, r.category, r.description, r.rank) for r in REGISTRY]


def extract_urls(s: str) -> list[str]:
    """Python-side URL extraction (reference p013.py:58-82 semantics)."""
    return _urls_py(s)
