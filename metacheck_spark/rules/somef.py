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

# The 8 metadata filenames the reference recognizes as metadata sources
# (/root/reference .../utils/pitfall_utils.py:88-89, duplicated at
# json_ld_utils.py:107-138).
METADATA_FILES = [
    "codemeta.json",
    "package.json",
    "pyproject.toml",
    "setup.py",
    "pom.xml",
    "cargo.toml",
    "description",
    "citation.cff",
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
    (p001.py:65-94; 'latest release' is positional releases[0], :54)."""
    meta_v = normalize_version(first_metadata_value(version_cat))
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
    """Codemeta identifier empty/blank (w015.py:4-35)."""
    cm = F.filter(
        identifier_cat,
        lambda e: F.lower(F.coalesce(e["source"], F.lit(""))).contains(
            "codemeta.json"
        ),
    )
    v = first_match(cm)["result"]["value"]
    return category_present(identifier_cat) & (
        v.isNull() | (F.trim(v) == "")
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
    URL (p026.py:27-82): two F3 selections from the SAME array — one by
    source, one by technique."""
    meta = first_metadata_value(code_repository_cat)
    api = first_match(technique_entries(code_repository_cat, "GitHub_API"))[
        "result"
    ]["value"]
    return (
        meta.isNotNull()
        & api.isNotNull()
        & (_normalize_repo_url(meta) != _normalize_repo_url(api))
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
