"""Shared regex patterns — single source of truth for the rule engine.

Each pattern string is used BOTH by the Spark side (``Column.rlike`` —
Java regex, substring-find semantics) and by the pure-Python oracle
(``re.search``). Patterns are restricted to the syntax subset where Java
and Python regexes agree (character classes, alternation, anchors,
bounded lookarounds). Patterns used in DuckDB-checked oracle queries
additionally avoid lookarounds (RE2 has none) — see rules/registry.py
``DUCKDB_SAFE``.

The pattern *semantics* mirror the reference detectors (cited per rule in
rules/registry.py), recast from SoMEF metadata fields onto the caption
column per BASELINE.json's north_rule.
"""

# URL extraction — reference p013.py:73 uses https?://[^\s<>"']+ | www.[^\s<>"']+
URL_EXTRACT = r"""(https?://[^\s<>"']+|www\.[^\s<>"']+)"""
# Trailing punctuation stripped after extraction (reference p013.py:78)
URL_TRAILING_PUNCT = r"""[.,;:!?)\]}'"]+$"""

# P002 — placeholder tokens in license/caption text (reference p002.py:30-59,
# 13 placeholder regexes such as <program>, [year], <year>)
P002_PLACEHOLDER = (
    r"(?i)(<year>|<program>|<name>|<owner>|<copyright holders?>"
    r"|\[year\]|\[fullname\]|\[name of copyright owner\]|\[yyyy\])"
)

# P005 — multiple-author separators after a credit marker
# (reference p005.py:6-29: ' and ', ' & ', ',' unless followed by Jr., ';', newline)
P005_MULTI_AUTHOR = r"(?i)\bby\s+[^.\n]*( and | & |;|,(?!\s+jr\.?))"

# P006 — readme/homepage heuristics (reference p006.py:6-49)
P006_HOMEPAGE_DOC_URL = (
    r"(?i)(https?://|www\.)\S*(readthedocs\.io|github\.io|/wiki\b|\bdocs\.|documentation)"
)

# P007 — software-archive URL patterns (reference p007.py:5-30)
P007_ARCHIVE_URL = (
    r"(?i)(zenodo\.org|figshare\.com|sourceforge\.net|archive\.org"
    r"|codeocean\.com|osf\.io|doi\.org/10\.5281|github\.com/\S+/releases)"
)

# P008 — local file path where a URL belongs (reference p008.py:6-39)
P008_LOCAL_LICENSE_PATH = (
    r"(?i)(^|\s)\.{0,2}/?[\w./-]*(license|copying|licence)[\w.-]*(\.md|\.txt|\.rst)\b"
)

# P011 — citation requested but no resolvable identifier (reference p011.py:4-57
# correlates reference_publication across categories; recast: 'cite' marker with
# no DOI anywhere while a URL is present)
P011_CITE_MARKER = r"(?i)\b(cite|citation)\b"
DOI_ANYWHERE = r"10\.\d{4,}/\S+"

# P016 — homepage where a repository link belongs (reference p016.py:5-28)
P016_HOMEPAGE_URL = r"(?i)(https?://www\.|(^|\s)www\.)\S+"
REPO_HOST = r"(?i)(github\.com|gitlab\.com|bitbucket\.org|sourceforge\.net/projects/)"

# P017 — copyright-only license text (reference p017.py:30-84: copyright pattern,
# no license-term pattern, short text)
P017_COPYRIGHT = r"(?i)\bcopyright\b|\(c\)\s*\d{4}|©"
P017_LICENSE_TERM = r"(?i)\b(license|licence|gpl|apache|bsd|mit|mozilla|permission is hereby granted)\b"

# P018 — malformed whitespace (reference p018.py:4-21: \n, \r, untrimmed, double space)
P018_NEWLINE = r"[\n\r]"

# P019 is a binary-consistency rule (stored phash vs recomputed) — no regex.

# P020 — prose field that is actually a URL (reference p020.py:5-26)
P020_BARE_URL = r"(?i)^\s*(https?://|www\.)\S+\s*$"

# P022 — license family named without a version (reference p022.py:6-62,
# per-family presence/versioned regex pairs)
P022_FAMILIES = [
    # (present-pattern, versioned-pattern)
    (r"(?i)\b(a?l?gpl)\b", r"(?i)\b(a?l?gpl)[- ]?v?\d(\.\d+)?"),
    (r"(?i)\bapache\b", r"(?i)\bapache([- ]license)?[- ]v?\d(\.\d+)?"),
    (r"(?i)\bbsd\b", r"(?i)(\d-clause[- ]bsd|bsd[- ]\d)"),
    (r"(?i)\bcc[- ]by\b", r"(?i)\bcc[- ]by\S*[- ]\d\.\d"),
]

# P023 — git-remote shorthand host:path (reference p023.py:5-27)
P023_GIT_SHORTHAND = (
    r"(^|\s)(git@)?[a-z][a-z0-9.-]*\.(com|org|net|io):[A-Za-z0-9._/-]+(\.git)?($|[\s.,])"
)

# P024 — bare DOI not wrapped as https://doi.org/ (reference p024.py:5-28)
P024_BARE_DOI = r"(^|\s)(doi:)?10\.\d{4,}/\S+"
DOI_URL = r"(?i)doi\.org/"

# P028 — raw SWHID (reference p028.py:5-24: ^swh:1:[a-z]+:[a-f0-9]{40}$)
P028_SWHID = r"(^|\s)swh:1:[a-z]{3}:[0-9a-f]{40}($|[\s.,;])"

# W003 — requirement without version constraint (reference w003.py:33-52:
# no version key and no operator in {== >= <= > < ~= != ^ ~})
W003_REQUIRES = r"(?i)\brequires\s+[a-z][\w-]*"
W003_REQUIRES_VERSIONED = r"(?i)\brequires\s+[a-z][\w-]*\s*(==|>=|<=|~=|!=|[><^~]|v?\d)"

# W004 — timestamp fields: 'updated:' vs 'modified:' markers; multi-format
# datetimes (reference w004.py:58-92 accepts 5 formats + date-prefix fallback)
W004_UPDATED = r"(?i)updated:\s*([0-9]{4}[-/][0-9]{2}[-/][0-9]{2}(T[0-9:]{8}Z?)?|[A-Z][a-z]{2} \d{1,2}, \d{4}|\d{2}-\d{2}-\d{4})"
W004_MODIFIED = r"(?i)modified:\s*([0-9]{4}[-/][0-9]{2}[-/][0-9]{2}(T[0-9:]{8}Z?)?|[A-Z][a-z]{2} \d{1,2}, \d{4}|\d{2}-\d{2}-\d{4})"
# Accepted datetime formats, Spark syntax ↔ Python strptime syntax
DATE_FORMATS = [
    ("yyyy-MM-dd'T'HH:mm:ss'Z'", "%Y-%m-%dT%H:%M:%SZ"),
    ("yyyy-MM-dd", "%Y-%m-%d"),
    ("dd-MM-yyyy", "%d-%m-%Y"),
    ("yyyy/MM/dd", "%Y/%m/%d"),
    ("MMM d, yyyy", "%b %d, %Y"),
]

# W010 — programming language named without a version (reference w010.py:4-36)
W010_LANG = r"(?i)\bwritten in (python|java|rust|c\+\+|ruby|go)\b"
W010_LANG_VERSIONED = r"(?i)\bwritten in (python|java|rust|c\+\+|ruby|go)\s+v?\d"

# W012 — one string packing multiple requirements (reference w012.py:6-39:
# split on 2+ spaces else on space-before-capital; >1 part fires)
W012_MULTI_DEP = r"deps:\s*[A-Z][\w.-]*(\s[A-Z][\w.-]*)+"

# W014 — name-like identifier while a valid one exists elsewhere
# (reference w014.py:5-44: not DOI, not URL, name-like; valid exists in other entry)
W014_NAME_ID = r"(?i)\bid:\s*[a-z][\w-]*"

# W021 — bracketed list with comma-separated parts (reference w021.py:43-48:
# \[(.*?)\] whose content splits on ',' into >= 2 parts)
W021_BRACKET_LIST = r"\[[^\]\[]*,[^\]\[]*\]"

# ---- scrub stage (PII / toxicity) — Python `re` executed in a pandas UDF
# (SURVEY.md §4.3: scrub must be Python re for byte-exact caption parity) ----
SCRUB_EMAIL = r"[\w.+-]+@[\w-]+\.[\w.-]*\w"
SCRUB_PHONE = r"(?<!\d)(\+?\d{1,2}[ -])?(\(\d{3}\)|\d{3})[ -]\d{3}[ -]\d{4}(?!\d)"
TOXIC_LEXICON = ["frak", "gorram", "smeg", "felgercarb", "shazbot"]  # stand-in lexicon
SCRUB_TOXIC = r"(?i)\b(" + "|".join(TOXIC_LEXICON) + r")\b"
