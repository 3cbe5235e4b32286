"""MetaCheck-parity operators over the NESTED SoMEF document schema —
the F1-F6 sub-operators of SURVEY.md §2.2 and representative rules built
from them, expressed exactly as the survey prescribes: higher-order array
functions with `element_at(filter(...), 1)` first-match semantics, never
explode-and-pick.

This is the faithful-semantics surface (the reference's own data model,
FIXTURES.md §2); the production pipeline recasts the same predicates onto
the flat images table (rules/registry.py). Reference citations per item.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The 8 metadata filenames the reference recognizes as metadata sources —
# the canonical list repeated in p001.py:18, w003.py:17, p005.py:55,
# p008/p013/p016/p022/p023/p027/w012/w021 (case varies per detector;
# comparison here is lowercase-contains, the broader of the two variants).
METADATA_FILES = [
    "codemeta.json",
    "description",
    "composer.json",
    "package.json",
    "pom.xml",
    "pyproject.toml",
    "requirements.txt",
    "setup.py",
]

# Target language set + aliases (pitfall_utils.py:5-38, target set :10).
TARGET_LANGUAGES = ["Python", "Java", "C++", "C", "R", "Rust"]
_LANG_ALIASES = {
    "python": "Python",
    "python3": "Python",
    "java": "Java",
    "c++": "C++",
    "cpp": "C++",
    "c": "C",
    "r": "R",
    "rust": "Rust",
}


# --- F1: category-presence predicate ---------------------------------------
# Reference: `if "version" not in somef_data` (p001.py:10-11, w015.py:15-16).
# Fixed schema => absent category is NULL or empty array.


def category_present(cat: Column) -> Column:
    return cat.isNotNull() & (F.size(cat) > 0)


# --- F2: source/technique entry filter -------------------------------------
# Reference: keep entries whose source contains a metadata filename and/or
# technique == 'code_parser' (p001.py:18-24, p005.py:53-63, w004.py:19-23).


def _source_is_metadata(e: Column) -> Column:
    src = F.lower(F.coalesce(e["source"], F.lit("")))
    cond = F.lit(False)
    for fname in METADATA_FILES:
        cond = cond | src.contains(fname)
    return cond


def metadata_entries(cat: Column) -> Column:
    """Entries originating from one of the 8 metadata files, parsed by the
    code parser — the reference's canonical entry filter."""
    return F.filter(
        cat,
        lambda e: (e["technique"] == "code_parser") & _source_is_metadata(e),
    )


def technique_entries(cat: Column, technique: str) -> Column:
    return F.filter(cat, lambda e: e["technique"] == technique)


def metadata_source_entries(cat: Column) -> Column:
    """Source-filename-only entry filter — the p001.py:24 / w003.py:23
    variant that does NOT require technique == code_parser."""
    return F.filter(cat, _source_is_metadata)


def scalar_value(e: Column) -> Column:
    """The reference handles result.value being a plain string OR a
    structured dict with a 'name' field, and SKIPS list values
    (e.g. p005.py:70-89: isinstance str -> use, isinstance dict -> use
    ['name'], else ignore). Spark's JSON reader stringifies objects into a
    declared string field, so a structured value arrives as JSON text —
    unwrap $.name for objects, null out arrays."""
    v = e["result"]["value"]
    t = F.trim(v)
    return (
        F.when(_is_stringified_array(t), F.lit(None).cast("string"))
        .when(_is_stringified_object(t), F.get_json_object(v, "$.name"))
        .otherwise(v)
    )


def _is_stringified_array(t: Column) -> Column:
    """True for Spark's stringification of a genuine JSON array (always
    double-quoted, no trailing text). Bracketed plain text like
    "['William', 'Michael'] Landau" — a python-repr embedded in a real
    string, the very thing W021 hunts — stays a string. (get_json_object
    can't arbitrate: it is lenient about single quotes AND trailing
    garbage.)"""
    return t.startswith("[") & t.endswith("]") & ~t.contains("'")


def _is_stringified_object(t: Column) -> Column:
    return t.startswith("{") & t.endswith("}") & ~t.contains("'")


# --- F3: first-match selection ---------------------------------------------
# Reference: linear scan with `break` — first qualifying entry wins, order =
# file order (p001.py:20-38, p005.py:56-88, w014.py:74-83). Spark:
# element_at(filter(arr, pred), 1) preserves array order exactly; NOT
# explode + arbitrary pick.


def first_match(filtered: Column) -> Column:
    return F.try_element_at(filtered, F.lit(1))


def first_metadata_value(cat: Column) -> Column:
    """First metadata-file entry's result.value (the selection every
    version/license/author rule starts from)."""
    return first_match(metadata_entries(cat))["result"]["value"]


# --- F4: metadata-source filename projection --------------------------------
# Reference: map source URL -> one of the 8 filenames else 'metadata files'
# (pitfall_utils.py:73-96).


def source_filename(src: Column) -> Column:
    low = F.lower(F.coalesce(src, F.lit("")))
    branches = [
        F.when(low.contains(fname), F.lit(fname)) for fname in METADATA_FILES
    ]
    return F.coalesce(*branches, F.lit("metadata files"))


# --- F5: version normalization ----------------------------------------------
# Reference: strip leading 'v'/'V', trim (pitfall_utils.py:63-71).


def normalize_version(v: Column) -> Column:
    return F.regexp_replace(F.trim(v), "^[vV]", "")


# --- F6: language extraction + normalization + order-preserving dedup -------
# Reference: pitfall_utils.py:5-38 (target set :10), :41-60.


def extract_languages(langs_cat: Column) -> Column:
    """Normalized target-language names from the programming_languages
    category, order-preserving dedup (array_distinct keeps first
    occurrence order, matching the reference's manual seen-set loop)."""
    alias_map = F.create_map(
        *[F.lit(x) for kv in _LANG_ALIASES.items() for x in kv]
    )
    names = F.transform(
        langs_cat,
        lambda e: alias_map[
            F.lower(F.trim(F.coalesce(e["result"]["value"], e["result"]["name"])))
        ],
    )
    return F.array_distinct(F.filter(names, lambda n: n.isNotNull()))


# --- Representative rules over the nested schema ----------------------------


def p001_version_mismatch(version_cat: Column, releases_cat: Column) -> Column:
    """First metadata-file version != releases[0].tag after v-strip
    (p001.py:65-94; 'latest release' is positional releases[0], :54;
    selection is source-filename-only, no technique gate, p001.py:24)."""
    meta_v = normalize_version(
        first_match(metadata_source_entries(version_cat))["result"]["value"]
    )
    rel = F.try_element_at(releases_cat, F.lit(1))
    rel_v = normalize_version(rel["result"]["tag"])
    return (
        meta_v.isNotNull()
        & rel_v.isNotNull()
        & (meta_v != rel_v)
    )


def p027_codemeta_version_mismatch(version_cat: Column) -> Column:
    """Codemeta version != any OTHER metadata-file version under STRICT
    compare (no v-strip — p027.py:84, the documented quirk vs P001)."""
    cm = F.filter(
        version_cat,
        lambda e: F.lower(F.coalesce(e["source"], F.lit(""))).contains(
            "codemeta.json"
        ),
    )
    cm_v = F.trim(first_match(cm)["result"]["value"])
    others = F.filter(
        metadata_entries(version_cat),
        lambda e: ~F.lower(F.coalesce(e["source"], F.lit(""))).contains(
            "codemeta.json"
        ),
    )
    return cm_v.isNotNull() & F.exists(
        others,
        lambda e: e["result"]["value"].isNotNull()
        & (F.trim(e["result"]["value"]) != cm_v),
    )


def w015_empty_identifier(identifier_cat: Column) -> Column:
    """Codemeta identifier present-but-blank (w015.py:22-35: the entry
    must carry a 'value' key; entries without one are skipped, so a null
    value here — indistinguishable from key-absent after schema read —
    abstains; only blank strings fire)."""
    return F.exists(
        identifier_cat,
        lambda e: F.lower(F.coalesce(e["source"], F.lit(""))).contains("codemeta")
        & e["result"]["value"].isNotNull()
        & (F.trim(e["result"]["value"]) == ""),
    )


def _normalize_repo_url(u: Column) -> Column:
    """lower, strip git+ prefix / .git suffix / trailing slash, SSH->HTTPS
    (p026.py:6-24)."""
    x = F.lower(F.trim(u))
    x = F.regexp_replace(x, "^git\\+", "")
    x = F.regexp_replace(x, "^git@([^:]+):", "https://$1/")
    x = F.regexp_replace(x, "\\.git$", "")
    return F.regexp_replace(x, "/$", "")


def p026_repo_mismatch(code_repository_cat: Column) -> Column:
    """Normalized codemeta code_repository != normalized GitHub_API repo
    URL (p026.py:27-82): the LAST GitHub_API entry wins (the reference's
    loop overwrites, :56-57), the metadata side is EVERY codemeta.json-
    sourced entry (:58-63), and ANY mismatch fires (:69-75)."""
    apis = technique_entries(code_repository_cat, "GitHub_API")
    api = F.when(
        F.size(apis) > 0, F.try_element_at(apis, F.size(apis))["result"]["value"]
    )
    return api.isNotNull() & F.exists(
        code_repository_cat,
        lambda e: (F.coalesce(e["technique"], F.lit("")) != "GitHub_API")
        & F.lower(F.coalesce(e["source"], F.lit(""))).contains("codemeta.json")
        & e["result"]["value"].isNotNull()
        & (_normalize_repo_url(e["result"]["value"]) != _normalize_repo_url(api)),
    )


def w010_language_without_version(langs_cat: Column) -> Column:
    """Codemeta programming_languages entry with NULL result.version ->
    fires; names collected via transform (w010.py:4-36)."""
    cm = F.filter(
        langs_cat,
        lambda e: (e["technique"] == "code_parser")
        & F.lower(F.coalesce(e["source"], F.lit(""))).contains("codemeta.json"),
    )
    return F.exists(cm, lambda e: e["result"]["version"].isNull())


def w010_unversioned_names(langs_cat: Column) -> Column:
    cm = F.filter(
        langs_cat,
        lambda e: (e["technique"] == "code_parser")
        & F.lower(F.coalesce(e["source"], F.lit(""))).contains("codemeta.json")
        & e["result"]["version"].isNull(),
    )
    return F.transform(cm, lambda e: F.coalesce(e["result"]["name"], e["result"]["value"]))


# ---------------------------------------------------------------------------
# Full 27-rule battery over the nested schema.
#
# The caption-recast registry (rules/registry.py) already carries each text
# pattern as a Column->Column predicate; here each rule applies that same
# predicate to the VALUE SELECTED THE REFERENCE'S WAY — first qualifying
# entry of the right category (F2+F3) — so the nested surface composes
# selection semantics with the shared pattern logic instead of duplicating
# either. Rules needing cross-entry or binary context get bespoke builders
# (p001/p019/p026/p027 above and below).

from pyspark.sql import DataFrame  # noqa: E402

from metacheck_spark.functions import patterns as PAT  # noqa: E402
from metacheck_spark.rules import registry as R  # noqa: E402

# rule code -> (category column name, selection) for the plain
# "pattern over first selected value" rules.
#   'meta'     = first metadata-file entry (F2+F3)
#   'codemeta' = first codemeta.json-sourced entry
#   'any'      = first entry of the category
_VALUE_RULES: dict[str, tuple[str, str]] = {
    "P006": ("readme_url", "codemeta"),
    "P007": ("reference_publication", "codemeta"),
    "W015": ("identifier", "codemeta"),
    "P017": ("license", "meta"),
    "P018": ("issues_url", "codemeta"),
    "P020": ("development_status", "codemeta"),
    "P023": ("code_repository", "meta"),
    "P024": ("identifier", "codemeta"),
    "P028": ("identifier", "codemeta"),
}


def codemeta_entries(cat: Column) -> Column:
    return F.filter(
        cat,
        lambda e: F.lower(F.coalesce(e["source"], F.lit(""))).contains(
            "codemeta.json"
        ),
    )


def _select_value(cat: Column, how: str) -> Column:
    # scalar_value mirrors the reference's isinstance-str guards: dict
    # values contribute their $.name, list values are skipped entirely
    # (critical on real corpora, where authors/requirements are often
    # structured and would otherwise leak JSON brackets/commas into the
    # text patterns).
    if how == "meta":
        return scalar_value(first_match(metadata_entries(cat)))
    if how == "codemeta":
        return scalar_value(first_match(codemeta_entries(cat)))
    return scalar_value(first_match(cat))


def _registry_pred(code: str):
    rule = next(r for r in R.REGISTRY if r.code == code)
    return rule.spark


def w003_unversioned_requirement(req_cat: Column) -> Column:
    """FIRST metadata-source requirements entry (w003.py:20-28, source-
    filename match only, break on first) is unversioned: no non-blank
    version field and no operator in the value (w003.py:33-52 — operators
    {== >= <= > < ~= != ^ ~})."""
    first = first_match(metadata_source_entries(req_cat))
    has_version = (
        first["result"]["version"].isNotNull()
        & (F.trim(first["result"]["version"]) != "")
    ) | F.coalesce(first["result"]["value"], F.lit("")).rlike(
        r"(==|>=|<=|~=|!=|[><^~])"
    )
    return first.isNotNull() & ~has_version


_P005_SEPARATORS = r"(?i)( and | & |;|\n|,(?!\s+Jr\.?))"


def p005_multi_author(authors_cat: Column) -> Column:
    """ANY code_parser metadata author entry whose value (plain string or
    structured $.name) holds multiple entities: ' and ', ' & ', ';',
    newline, or ',' unless followed by Jr. — the Jr. comma exception and
    IGNORECASE matching are p005.py:14-29; the scan-all-entries loop is
    p005.py:58-89."""
    return F.exists(
        metadata_entries(authors_cat),
        lambda e: F.coalesce(scalar_value(e), F.lit("")).rlike(_P005_SEPARATORS),
    )


def w012_packed_requirements(req_cat: Column) -> Column:
    """One requirement STRING encoding several: splits into >1 part on
    2+ spaces, else on space-before-capital (w012.py:6-39).

    Entry filter preserved verbatim from w012.py:66-70 including its
    oddity: technique ∈ metadata FILENAMES (SURVEY.md §2.2 notes the
    quirk) OR source containing one of ONLY {codemeta.json, setup.py,
    pom.xml}. String values and single-element list values are examined
    (w012.py:74-98); longer lists are skipped."""

    def qualifies(e: Column) -> Column:
        tech = F.coalesce(e["technique"], F.lit(""))
        src = F.lower(F.coalesce(e["source"], F.lit("")))
        return tech.isin(METADATA_FILES) | (
            src.contains("codemeta.json")
            | src.contains("setup.py")
            | src.contains("pom.xml")
        )

    def fires(e: Column) -> Column:
        raw = e["result"]["value"]
        t = F.trim(raw)
        # 1-element stringified list -> its sole string; longer lists skipped
        v = (
            F.when(
                _is_stringified_array(t),
                F.when(
                    F.get_json_object(raw, "$[1]").isNull(),
                    F.get_json_object(raw, "$[0]"),
                ),
            )
            .when(_is_stringified_object(t), F.lit(None).cast("string"))
            .otherwise(raw)
        )
        v = F.coalesce(v, F.lit(""))
        return qualifies(e) & (v.rlike(r"\S\s{2,}\S") | v.rlike(r"\S (?=[A-Z])"))

    return F.exists(req_cat, fires)


def w021_author_bracket_list(authors_cat: Column) -> Column:
    """Metadata author STRING embedding a bracketed comma list like
    "['William', 'Michael'] Landau" (w021.py:41-54) — genuine structured
    list values (valid JSON) are a different shape and do not fire."""

    def fires(e: Column) -> Column:
        v = e["result"]["value"]
        t = F.trim(v)
        plain = v.isNotNull() & ~_is_stringified_array(t) & ~_is_stringified_object(t)
        return plain & v.rlike(r"\[[^\]\[]*,[^\]\[]*\]")

    return F.exists(metadata_entries(authors_cat), fires)


# The 13 placeholder patterns of p002.py:37-51, as one alternation over
# the lowercased LICENSE.md content.
_P002_PLACEHOLDERS_FULL = (
    r"(<program>|<year>|<name of author>|<name>|<copyright holders?>|<owner>"
    r"|<author>|\[year\]|\[fullname\]|\[name\]|\[copyright holder\]|<yyyy>"
    r"|<name of copyright owner>)"
)


def p002_license_placeholders(license_cat: Column) -> Column:
    """FIRST entry whose source contains LICENSE.md (p002.py:17-26, break
    on first) has template placeholders in its content (13 patterns,
    lowercased match, p002.py:30-59)."""
    lic = first_match(
        F.filter(
            license_cat,
            lambda e: F.coalesce(e["source"], F.lit("")).contains("LICENSE.md"),
        )
    )
    return F.lower(F.coalesce(lic["result"]["value"], F.lit(""))).rlike(
        _P002_PLACEHOLDERS_FULL
    )


# p022.py:28-35 — family presence is SUBSTRING on the uppercased value
# (no word boundary: 'LGPL-3.0' contains 'GPL' but its version pattern
# also matches, so it does not fire), versioned patterns verbatim.
_P022_FAMILIES_FULL = [
    ("GPL", r"GPL-?\d+(\.\d+)?"),
    ("LGPL", r"LGPL-?\d+(\.\d+)?"),
    ("AGPL", r"AGPL-?\d+(\.\d+)?"),
    ("APACHE", r"APACHE-?\d+(\.\d+)?"),
    ("CC", r"CC[- ]BY[- ]?\d+(\.\d+)?"),
    ("BSD", r"BSD-?\d+[- ]CLAUSE"),
]


def p022_license_no_version(license_cat: Column) -> Column:
    """ANY code_parser metadata license entry naming a license family
    without its version (p022.py:37-61, scan-all with break-on-fire)."""

    def entry_fires(e: Column) -> Column:
        up = F.upper(F.coalesce(e["result"]["value"], F.lit("")))
        cond = F.lit(False)
        for fam, pat in _P022_FAMILIES_FULL:
            cond = cond | (up.contains(fam) & ~up.rlike(pat))
        return cond

    return F.exists(metadata_entries(license_cat), entry_fires)


_P016_REPO_INDICATORS = [
    "github.com/", "gitlab.com/", "bitbucket.org/",
    "sourceforge.net/projects/", "git.", ".git",
]
_P016_HOME_INDICATORS = [
    ".org/", ".com/", ".net/", ".io/", "www.", "docs.",
    "documentation", "readthedocs", "github.io",
]


def p016_homepage_as_repo(code_repo_cat: Column) -> Column:
    """ANY metadata code_repository entry that looks like a homepage, not
    a repo (p016.py:14-22 repo indicators, :41-51 homepage indicators,
    :88-107 scan-all loop with break-on-fire; repo indicator wins)."""

    def contains_any(v: Column, subs: list[str]) -> Column:
        cond = F.lit(False)
        for s in subs:
            cond = cond | v.contains(s)
        return cond

    def fires(e: Column) -> Column:
        v = F.lower(F.coalesce(e["result"]["value"], F.lit("")))
        return ~contains_any(v, _P016_REPO_INDICATORS) & contains_any(
            v, _P016_HOME_INDICATORS
        )

    return F.exists(metadata_source_entries(code_repo_cat), fires)


_P008_FILE_NAMES = [
    "license", "license.md", "license.txt", "license.rst",
    "copying", "copying.md", "copying.txt",
    "copyright", "copyright.md", "copyright.txt",
    "licence", "licence.md", "licence.txt",
    "readme.md", "doc.txt", "file.rst",
]


def p008_local_license(license_cat: Column) -> Column:
    """ANY license entry from code_parser OR a metadata source whose value
    is a local file reference instead of a license name (p008.py:5-38:
    http(s) exempt; ./ or ../ prefix, any slash/backslash, a known license
    filename, or a .md/.txt/.rst suffix fires; :63-77 entry loop — note
    the OR between technique and source, unlike p005/p022's AND)."""

    def is_local(v: Column) -> Column:
        low = F.lower(F.trim(v))
        not_http = ~low.startswith("http://") & ~low.startswith("https://")
        rel = v.startswith("./") | v.startswith("../")
        slash = v.contains("/") | v.contains("\\")
        named = low.isin(_P008_FILE_NAMES)
        ext = low.endswith(".md") | low.endswith(".txt") | low.endswith(".rst")
        return v.isNotNull() & not_http & (rel | slash | named | ext)

    return F.exists(
        license_cat,
        lambda e: ((e["technique"] == "code_parser") | _source_is_metadata(e))
        & is_local(e["result"]["value"]),
    )


def w004_stale_vs_codemeta(date_updated_cat: Column) -> Column:
    """GitHub_API date_updated > codemeta dateModified by more than 1 day
    (w004.py:104-145): two F3 selections from the same category, the
    5-format timestamp ladder on each."""
    api_raw = first_match(technique_entries(date_updated_cat, "GitHub_API"))[
        "result"
    ]["value"]
    cm_raw = first_match(codemeta_entries(date_updated_cat))["result"]["value"]

    def parse(raw: Column) -> Column:
        return F.coalesce(
            *[F.try_to_timestamp(raw, F.lit(f)) for f, _ in PAT.DATE_FORMATS]
        )

    upd, mod = parse(api_raw), parse(cm_raw)
    return upd.isNotNull() & mod.isNotNull() & (F.datediff(upd, mod) > 1)


def w014_name_id_while_valid_exists(identifier_cat: Column) -> Column:
    """Codemeta identifier is name-like (not DOI, not URL) while a valid
    DOI/URL identifier exists in ANOTHER entry (w014.py:47-112): two
    selections over the same array."""
    valid = (
        lambda v: v.rlike(r"(?i)^(doi:)?10\.\d{4,}/\S+$")
        | v.rlike(r"(?i)^https?://\S+$")
    )
    cm_v = F.trim(first_match(codemeta_entries(identifier_cat))["result"]["value"])
    name_like = (
        cm_v.isNotNull() & (cm_v != "") & ~valid(cm_v) & cm_v.rlike(r"^[A-Za-z][\w-]*$")
    )
    other_valid = F.exists(
        identifier_cat,
        lambda e: e["result"]["value"].isNotNull()
        & valid(F.trim(e["result"]["value"])),
    )
    return name_like & other_valid


def p011_citation_without_doi(reference_publication_cat: Column,
                              identifier_cat: Column) -> Column:
    """Reference-publication present while no DOI-valued identifier exists
    anywhere (p011.py:4-57 cross-category correlation, recast to the two
    categories this schema carries)."""
    has_ref = category_present(reference_publication_cat)
    has_doi = F.exists(
        identifier_cat,
        lambda e: F.coalesce(e["result"]["value"], F.lit("")).rlike(
            PAT.DOI_ANYWHERE
        ),
    )
    return has_ref & ~has_doi


def p019_download_url_version_mismatch(download_url_cat: Column,
                                       releases_cat: Column) -> Column:
    """Version parsed from the codemeta download_url != latest release tag
    after v-strip (p019.py:60-110)."""
    url = first_match(codemeta_entries(download_url_cat))["result"]["value"]
    url_v = F.regexp_extract(url, r"[/-]v?(\d+\.\d+(?:\.\d+)?)(?:\.(?:zip|tar\.gz|tgz))?(?:$|[/?#])", 1)
    rel = F.try_element_at(releases_cat, F.lit(1))
    rel_v = normalize_version(rel["result"]["tag"])
    return (
        (url_v != "") & url_v.isNotNull()
        & rel_v.isNotNull()
        & (url_v != rel_v)
    )


def w010_flag(langs_cat: Column) -> Column:
    return w010_language_without_version(langs_cat)


def nested_rule_flags(df: DataFrame, url_status_map: dict[str, int] | None = None) -> DataFrame:
    """Append one boolean `hit_<code>` column per reference rule, evaluated
    over the nested SoMEF columns with the reference's own selection
    semantics. Missing categories (column absent from df) make the rule
    abstain (null -> false), mirroring F1.

    URL-status rules (P013 over software_requirements, P025 over
    continuous_integration) evaluate against the frozen dict when given,
    else abstain — same contract as the pipeline's url_mode='udf'.
    """
    cols = set(df.columns)

    def cat(name: str) -> Column | None:
        return F.col(name) if name in cols else None

    flags: dict[str, Column] = {}
    for code, (category, how) in _VALUE_RULES.items():
        c = cat(category)
        if c is None:
            flags[code] = F.lit(False)
            continue
        value = _select_value(c, how)
        if code == "W015":
            flags[code] = w015_empty_identifier(c)
        else:
            flags[code] = F.coalesce(_registry_pred(code)(value), F.lit(False))

    if cat("version") is not None:
        rel = cat("releases")
        flags["P001"] = (
            F.coalesce(p001_version_mismatch(F.col("version"), rel), F.lit(False))
            if rel is not None
            else F.lit(False)
        )
        flags["P027"] = F.coalesce(
            p027_codemeta_version_mismatch(F.col("version")), F.lit(False)
        )
    else:
        flags["P001"] = flags["P027"] = F.lit(False)

    flags["W003"] = (
        F.coalesce(w003_unversioned_requirement(F.col("requirements")), F.lit(False))
        if cat("requirements") is not None
        else F.lit(False)
    )
    flags["W012"] = (
        F.coalesce(w012_packed_requirements(F.col("requirements")), F.lit(False))
        if cat("requirements") is not None
        else F.lit(False)
    )
    flags["W021"] = (
        F.coalesce(w021_author_bracket_list(F.col("authors")), F.lit(False))
        if cat("authors") is not None
        else F.lit(False)
    )
    flags["P005"] = (
        F.coalesce(p005_multi_author(F.col("authors")), F.lit(False))
        if cat("authors") is not None
        else F.lit(False)
    )
    flags["P016"] = (
        F.coalesce(p016_homepage_as_repo(F.col("code_repository")), F.lit(False))
        if cat("code_repository") is not None
        else F.lit(False)
    )
    flags["P002"] = (
        F.coalesce(p002_license_placeholders(F.col("license")), F.lit(False))
        if cat("license") is not None
        else F.lit(False)
    )
    flags["P008"] = (
        F.coalesce(p008_local_license(F.col("license")), F.lit(False))
        if cat("license") is not None
        else F.lit(False)
    )
    flags["P022"] = (
        F.coalesce(p022_license_no_version(F.col("license")), F.lit(False))
        if cat("license") is not None
        else F.lit(False)
    )
    flags["W004"] = (
        F.coalesce(w004_stale_vs_codemeta(F.col("date_updated")), F.lit(False))
        if cat("date_updated") is not None
        else F.lit(False)
    )
    flags["W010"] = (
        F.coalesce(w010_flag(F.col("programming_languages")), F.lit(False))
        if cat("programming_languages") is not None
        else F.lit(False)
    )
    flags["W014"] = (
        F.coalesce(w014_name_id_while_valid_exists(F.col("identifier")), F.lit(False))
        if cat("identifier") is not None
        else F.lit(False)
    )
    flags["P011"] = (
        F.coalesce(
            p011_citation_without_doi(
                F.col("reference_publication"), F.col("identifier")
            ),
            F.lit(False),
        )
        if cat("reference_publication") is not None and cat("identifier") is not None
        else F.lit(False)
    )
    flags["P026"] = (
        F.coalesce(p026_repo_mismatch(F.col("code_repository")), F.lit(False))
        if cat("code_repository") is not None
        else F.lit(False)
    )
    flags["P019"] = (
        F.coalesce(
            p019_download_url_version_mismatch(
                F.col("download_url"), F.col("releases")
            ),
            F.lit(False),
        )
        if cat("download_url") is not None and cat("releases") is not None
        else F.lit(False)
    )

    # URL-accessibility rules against the frozen dimension (quirk pair:
    # P013 2xx∪301 ok over software_requirements, p013.py:47; P025 strict
    # 2xx over continuous_integration, p025.py:40-41).
    def url_flag(category: str, ok) -> Column:
        c = cat(category)
        if c is None or not url_status_map:
            return F.lit(False)
        status_map = F.create_map(
            *[
                F.lit(x)
                for url, code_ in url_status_map.items()
                for x in (url, code_)
            ]
        )
        value = first_match(c)["result"]["value"]
        urls = F.transform(
            F.regexp_extract_all(value, F.lit(PAT.URL_EXTRACT), 0),
            lambda u: F.regexp_replace(u, PAT.URL_TRAILING_PUNCT, ""),
        )
        return F.coalesce(
            F.exists(
                urls,
                lambda u: status_map[u].isNotNull() & ~ok(status_map[u]),
            ),
            F.lit(False),
        )

    flags["P013"] = url_flag(
        "software_requirements",
        lambda s: ((s >= 200) & (s < 300)) | (s == 301),
    )
    flags["P025"] = url_flag(
        "continuous_integration", lambda s: (s >= 200) & (s < 300)
    )

    out = df
    for code in [r.code for r in R.REGISTRY if not r.code.startswith("X")]:
        out = out.withColumn(f"hit_{code}", flags.get(code, F.lit(False)))
    return out
