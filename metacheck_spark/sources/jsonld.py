"""Reference-shaped JSON-LD assessment documents over the nested SoMEF
schema — the S5 sink at full fidelity: the complete document shell
(@context / creator / assessedSoftware / license set-typo and all,
json_ld_utils.py:462-508), per-check `process` descriptions
(json_ld_utils.py:54-88), `evidence` templates (:141-315) and
`suggestion` texts (:402-436), assembled natively with to_json(struct)
— no driver-side loop, one projection per document.

Parity: tools/ref_jsonld_parity.py executes the reference's own
create_pitfall_jsonld over the shipped corpus and deep-compares every
generated document (modulo dateCreated, which the reference stamps with
utcnow)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metacheck_spark.rules import somef as M
from metacheck_spark.sources.jsonld_text import (  # noqa: F401
    CATEGORIES,
    CODES,
    DESCRIPTIONS,
    SUGGESTIONS,
    SUMMARY_DESCRIPTIONS,
)




_META_EXTS = [".json", ".xml", ".yml", ".toml", ".txt"]


def metadata_source_filename(src: Column) -> Column:
    """extract_metadata_source_filename, pitfall_utils.py:73-96 /
    json_ld_utils.py:107-138: case-sensitive known-filename contains,
    then a path-basename fallback gated on known metadata extensions,
    else 'metadata files'."""
    known = [
        F.when(src.contains(f), F.lit(f)) for f in M._METADATA_FILES_CS
    ]

    def _with_base(base: Column) -> Column:
        ext_ok = F.lit(False)
        for ext in _META_EXTS:
            ext_ok = ext_ok | F.lower(base).contains(ext)
        fallback = F.when(
            (src.contains("/") | src.contains("\\"))
            & (base.isin(M._METADATA_FILES_CS) | ext_ok),
            base,
        )
        return F.coalesce(*known, fallback, F.lit("metadata files"))

    return F.when(
        src.isNull() | (src == ""), F.lit("metadata files")
    ).otherwise(
        M.let(F.element_at(F.split(src, r"[/\\]"), -1), _with_base)
    )


def _q(v: Column) -> Column:
    """'{v}' with the reference's `or 'unknown'` falsy fallback."""
    return F.when(v.isNull() | (v == ""), F.lit("unknown")).otherwise(v)


def _pyrepr(v: Column) -> Column:
    """How the reference's f-string renders the raw value: a Python list
    of strings interpolates as its repr (['a', 'b']); our schema carries
    it as the stringified source JSON, so parse and re-render. Plain
    strings pass through."""
    t = F.trim(v)
    return M.let(
        F.from_json(v, "array<string>"),
        lambda arr: F.when(
            M._is_stringified_array(t) & arr.isNotNull() & (F.size(arr) == 0),
            F.lit("[]"),
        )
        .when(
            M._is_stringified_array(t) & arr.isNotNull(),
            F.concat(F.lit("['"), F.array_join(arr, "', '"), F.lit("']")),
        )
        .otherwise(v),
    )


def _iso(ts: Column) -> Column:
    """datetime.isoformat(): microseconds rendered as .%06d only when
    nonzero (w004 evidence dates)."""
    micros = F.unix_micros(ts) % 1000000
    return F.concat(
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"),
        F.when(micros != 0, F.format_string(".%06d", micros)).otherwise(F.lit("")),
    )


def _first_firing(entries: Column, fires) -> Column:
    return M.first_match(F.filter(entries, fires))


def _last_firing(entries: Column, fires) -> Column:
    hits = F.filter(entries, fires)
    return F.when(F.size(hits) > 0, F.try_element_at(hits, F.size(hits)))


def evidence_columns(
    url_status_map: dict[str, int] | None = None,
) -> tuple[list[dict[str, Column]], dict[str, Column]]:
    """code -> evidence string Column (meaningful only where the rule
    fired), plus the bottom-up LEVELS of intermediate columns the render
    expressions reference (each level is name -> Column, to be added
    with .select("*", ...) before the next level / the renders). Each
    evidence string reproduces format_evidence_text's branch for that
    code (json_ld_utils.py:141-315), selecting the same firing entry the
    detector stored its payload from.

    Task-binary discipline (round-5): a render used to be ONE
    self-contained Column tree, and wrappers like _q (3 references of
    their argument) and _pyrepr (~5) cloned each ~80-node selector
    subtree into it 3-15x — the collapsed document projection
    serialized to 18.6 MiB of Catalyst nodes (measured,
    tools/measure_task_binary.py). Materializing every selected entry /
    derived scalar as a named column one level below keeps one copy of
    each: CollapseProject never inlines a non-cheap alias referenced
    more than once (canCollapseExpressions), so the lower projections
    survive optimization and the renders reference attributes. The
    shared url-status map literal gets its own level for the same
    reason (it used to be re-inlined per use). Selectors are
    hit-guarded (F.when(hit_X, sel)) to keep the old lazy-skip
    semantics: unfired rows evaluate a boolean attribute, not the
    selector scan, exactly like the previous when(hit, struct(..ev..))
    shape evaluated lazily under codegen."""
    lvl0: dict[str, Column] = {}  # shared literals (url-status map)
    lvl1: dict[str, Column] = {}  # hit-guarded selected entries/values
    lvl2: dict[str, Column] = {}  # derived scalars over lvl1 columns
    ev: dict[str, Column] = {}

    def base(code: str) -> Column:
        return F.lit(f"{code} detected: ")

    cols = F.col

    def guard(code: str, c: Column) -> Column:
        return F.when(cols(f"hit_{code}"), c)

    # P001 — normalized versions + metadata_source_file (p001.py:88-99)
    meta_sel = _first_firing(
        cols("version"),
        lambda e: M._source_is_metadata_cs(e) & e["result"]["value"].isNotNull(),
    )
    lvl1["_evs_p001"] = guard("P001", meta_sel)
    lvl1["_evs_p001_rv"] = guard(
        "P001",
        M.normalize_version(
            F.try_element_at(cols("releases"), F.lit(1))["result"]["tag"]
        ),
    )
    lvl2["_evd_p001_mv"] = M.normalize_version(
        cols("_evs_p001")["result"]["value"]
    )
    ev["P001"] = F.concat(
        base("P001"),
        metadata_source_filename(cols("_evs_p001")["source"]),
        F.lit(" version '"), _q(cols("_evd_p001_mv")),
        F.lit("' does not match release version '"),
        _q(cols("_evs_p001_rv")), F.lit("'"),
    )

    ev["P002"] = F.concat(
        base("P002"), F.lit(" License file contains unreplaced template placeholders")
    )

    # W003 — the single selected requirement's name-else-value (w003.py:78)
    w003_sel = _first_firing(
        cols("requirements"),
        lambda e: e["source"].isNotNull() & M._source_is_metadata_cs(e),
    )
    lvl1["_evs_w003"] = guard("W003", w003_sel)
    # w003 label: req.get("name", req.get("value", "unknown")) — SoMEF
    # requirement results virtually always CARRY a name key (often null),
    # and a present-null name renders the fallback text (the None is
    # filtered, json_ld_utils.py:164); so name-null => fallback, NOT value
    req_label = cols("_evs_w003")["result"]["name"]
    ev["W003"] = F.when(
        req_label.isNotNull(),
        F.concat(
            base("W003"),
            metadata_source_filename(cols("_evs_w003")["source"]),
            F.lit(" contains software requirements without versions: "),
            req_label,
        ),
    ).otherwise(
        F.concat(
            base("W003"),
            F.lit("Software requirements found without version specifications"),
        )
    )

    # W004 — parsed isoformat dates (w004 evidence, json_ld_utils.py:172-176)
    api_raw = M.first_match(
        F.filter(
            cols("date_updated"),
            lambda e: (e["technique"] == "GitHub_API")
            & e["result"]["value"].isNotNull(),
        )
    )["result"]["value"]
    cm_raw = M.first_match(
        F.filter(
            cols("date_updated"),
            lambda e: (
                (e["source"].isNotNull() & e["source"].contains("codemeta.json"))
                | (e["source"].isNull() & (e["technique"] == "code_parser"))
            )
            & e["result"]["value"].isNotNull(),
        )
    )["result"]["value"]
    lvl1["_evs_w004_api"] = guard("W004", api_raw)
    lvl1["_evs_w004_cm"] = guard("W004", cm_raw)
    lvl2["_evd_w004_api_ts"] = M.w004_parse_date(cols("_evs_w004_api"))
    lvl2["_evd_w004_cm_ts"] = M.w004_parse_date(cols("_evs_w004_cm"))
    ev["W004"] = F.concat(
        base("W004"), F.lit("codemeta.json dateModified '"),
        _iso(cols("_evd_w004_cm_ts")),
        F.lit("' is outdated compared to repository date '"),
        _iso(cols("_evd_w004_api_ts")), F.lit("'"),
    )

    # P005 — the firing author value (scalar; dict -> $.name)
    p005_sel = _first_firing(
        M.metadata_entries(cols("authors")),
        lambda e: F.coalesce(M.scalar_value(e), F.lit("")).rlike(
            M._P005_SEPARATORS
        ),
    )
    lvl1["_evs_p005"] = guard("P005", p005_sel)
    lvl2["_evd_p005_val"] = M.scalar_value(cols("_evs_p005"))
    ev["P005"] = F.concat(
        base("P005"),
        metadata_source_filename(cols("_evs_p005")["source"]),
        F.lit(" Multiple authors found in single field: '"),
        _q(cols("_evd_p005_val")), F.lit("'"),
    )

    p006_sel = _first_firing(
        F.filter(
            cols("readme_url"),
            lambda e: (e["technique"] == "code_parser")
            & F.coalesce(e["source"], F.lit("")).contains("codemeta.json"),
        ),
        lambda e: M.p006_is_homepage_url(M.string_value(e)),
    )
    lvl1["_evs_p006"] = guard("P006", p006_sel)
    ev["P006"] = F.concat(
        base("P006"),
        F.lit(" codemeta.json README property points to homepage/wiki instead of README file: "),
        F.coalesce(M.string_value(cols("_evs_p006")), F.lit("unknown URL")),
    )

    p007_sel = _first_firing(
        M.codemeta_or_entries(cols("reference_publication")),
        lambda e: M.p007_is_software_archive_url(M.string_value(e)),
    )
    lvl1["_evs_p007"] = guard("P007", p007_sel)
    ev["P007"] = F.concat(
        base("P007"),
        F.lit("codemeta.json Reference publication points to software archive instead of paper: "),
        F.coalesce(M.string_value(cols("_evs_p007")), F.lit("unknown URL")),
    )

    p008_sel = _first_firing(
        F.filter(
            cols("license"),
            lambda e: (e["technique"] == "code_parser") | M._source_is_metadata(e),
        ),
        lambda e: M.p008_is_local(e["result"]["value"]),
    )
    lvl1["_evs_p008"] = guard("P008", p008_sel)
    ev["P008"] = F.concat(
        base("P008"),
        metadata_source_filename(cols("_evs_p008")["source"]),
        F.lit(" License points to local file instead of license name: '"),
        _q(cols("_evs_p008")["result"]["value"]), F.lit("'"),
    )

    # W010 — every null-version codemeta language name (w010.py:32-34)
    w010_names = F.transform(
        F.filter(
            cols("programming_languages"),
            lambda e: (e["technique"] == "code_parser")
            & F.coalesce(e["source"], F.lit("")).contains("codemeta.json")
            & e["result"]["version"].isNull(),
        ),
        lambda e: F.coalesce(e["result"]["name"], F.lit("Unknown")),
    )
    lvl1["_evs_w010_names"] = guard("W010", w010_names)
    ev["W010"] = F.when(
        F.size(cols("_evs_w010_names")) > 0,
        F.concat(
            base("W010"),
            F.lit("codemeta.json Programming languages without versions: "),
            F.array_join(cols("_evs_w010_names"), ", "),
        ),
    ).otherwise(
        F.concat(
            base("W010"),
            F.lit(" codemeta.json Programming languages in metadata do not have version specifications"),
        )
    )

    ev["P011"] = F.concat(
        base("P011"),
        F.lit("CITATION.cff file exists but does not contain referencePublication while codemeta.json references it"),
    )

    # W012 — the evidence template reads 'requirements_string' but the
    # detector stores 'requirement_string' (w012.py:78), so the DEFAULT
    # fallback always renders (json_ld_utils.py:313-315)
    ev["W012"] = F.concat(
        base("W012"), F.lit("Issue detected in "), cols("_file")
    )

    # P013 — invalid URLs of the firing entry, first 3 (json_ld_utils:219-235)
    if url_status_map:
        lvl0["_evm_status"] = F.create_map(
            *[F.lit(x) for u, c in url_status_map.items() for x in (u, c)]
        )
        smap = cols("_evm_status")

        def _urls(e: Column) -> Column:
            text = F.coalesce(e["result"]["value"], F.lit(""))
            u1 = F.regexp_extract_all(text, F.lit(r"(?i)(https?://[^\s<>\"']+)"), 0)
            u2 = F.regexp_extract_all(text, F.lit(r"(?i)(www\.[^\s<>\"']+)"), 0)
            return F.transform(
                F.concat(u1, u2), lambda u: F.regexp_replace(u, r"[,;.!?)]$", "")
            )

        def _inaccessible(u: Column) -> Column:
            valid = u.rlike(r"^(?i)https?://[^/\s]+")
            s = smap[F.trim(u)]
            ok = ((s >= 200) & (s < 300)) | (s == 301)
            return ~(valid & s.isNotNull() & ok)

        p013_sel = _first_firing(
            M.metadata_entries(cols("software_requirements")),
            lambda e: (F.size(_urls(e)) > 0) & F.exists(_urls(e), _inaccessible),
        )
        lvl1["_evs_p013"] = guard("P013", p013_sel)
        lvl2["_evd_p013_bad"] = F.filter(
            _urls(cols("_evs_p013")), _inaccessible
        )
        bad = cols("_evd_p013_bad")
        ev["P013"] = F.concat(
            base("P013"),
            metadata_source_filename(cols("_evs_p013")["source"]),
            F.lit(" Software requirements contain invalid URLs: "),
            F.array_join(F.slice(bad, 1, 3), ", "),
            F.when(F.size(bad) > 3, F.lit("...")).otherwise(F.lit("")),
        )

        # P025 — status of the firing CI url (json_ld_utils:295-299)
        def _ci_status(e: Column) -> Column:
            u = e["result"]["value"]
            s = smap[F.trim(u)]
            return F.when(
                u.rlike(r"^(?i)https?://[^/\s]+") & s.isNotNull() & (s >= 0),
                s.cast("string"),
            ).otherwise(F.lit("unknown"))

        p025_sel = _first_firing(
            M.codemeta_or_entries(cols("continuous_integration")),
            lambda e: e["result"]["value"].isNotNull()
            & ~(
                e["result"]["value"].rlike(r"^(?i)https?://[^/\s]+")
                & smap[F.trim(e["result"]["value"])].isNotNull()
                & (smap[F.trim(e["result"]["value"])] >= 200)
                & (smap[F.trim(e["result"]["value"])] < 300)
            ),
        )
        lvl1["_evs_p025"] = guard("P025", p025_sel)
        lvl2["_evd_p025_status"] = _ci_status(cols("_evs_p025"))
        lvl2["_evd_p025_rep"] = _pyrepr(cols("_evs_p025")["result"]["value"])
        ev["P025"] = F.concat(
            base("P025"),
            F.lit("codemeta.json Continuous integration URL returns "),
            cols("_evd_p025_status"), F.lit(": "),
            F.when(
                F.trim(
                    F.coalesce(cols("_evs_p025")["result"]["value"], F.lit(""))
                ).isin("", "[]", "{}"),
                F.lit("unknown URL"),
            ).otherwise(cols("_evd_p025_rep")),
        )
    else:
        ev["P013"] = F.concat(
            base("P013"), F.lit("Software requirements contain invalid URLs")
        )
        ev["P025"] = F.concat(base("P025"), F.lit("Issue detected in "), cols("_file"))

    w014_cm = M.first_match(
        F.filter(
            cols("identifier"),
            lambda e: (e["technique"] == "code_parser")
            & F.lower(F.coalesce(e["source"], F.lit(""))).contains("codemeta.json")
            & e["result"]["value"].isNotNull(),
        )
    )["result"]["value"]
    lvl1["_evs_w014"] = guard("W014", w014_cm)
    lvl2["_evd_w014_rep"] = _pyrepr(cols("_evs_w014"))
    ev["W014"] = F.concat(
        base("W014"),
        F.lit("codemeta.json Identifier is a name instead of valid unique identifier: '"),
        _q(cols("_evd_w014_rep")), F.lit("'"),
    )

    ev["W015"] = F.concat(
        base("W015"), F.lit("codemeta.json identifier field is empty or missing")
    )

    p016_sel = _first_firing(
        F.filter(
            cols("code_repository"),
            lambda e: M._technique_is_filename(e) | M._source_is_metadata_nodesc(e),
        ),
        lambda e: M._is_structured(e)
        | (
            ~M._contains_any(
                F.lower(F.coalesce(M.string_value(e), F.lit(""))),
                M._P016_REPO_INDICATORS,
            )
            & M._contains_any(
                F.lower(F.coalesce(M.string_value(e), F.lit(""))),
                M._P016_HOME_INDICATORS,
            )
        ),
    )
    lvl1["_evs_p016"] = guard("P016", p016_sel)
    ev["P016"] = F.concat(
        base("P016"),
        metadata_source_filename(cols("_evs_p016")["source"]),
        F.lit(" codeRepository points to homepage instead of repository: "),
        F.coalesce(M.string_value(cols("_evs_p016")), F.lit("unknown URL")),
    )

    ev["P017"] = F.concat(
        base("P017"),
        F.lit("LICENSE file only contains copyright information without actual license terms"),
    )

    p018_sel = _first_firing(
        M.codemeta_or_entries(cols("issues_url")),
        lambda e: M.p018_has_format_violation(M.string_value(e)),
    )
    lvl1["_evs_p018"] = guard("P018", p018_sel)
    ev["P018"] = F.concat(
        base("P018"),
        F.lit("codemeta.json IssueTracker URL violates expected format: "),
        F.coalesce(M.string_value(cols("_evs_p018")), F.lit("unknown URL")),
    )

    p019_sel = M.first_match(
        F.filter(
            cols("download_url"),
            lambda e: (
                F.coalesce(e["source"], F.lit("")).contains("codemeta.json")
                | (
                    (e["technique"] == "code_parser")
                    & F.lower(F.coalesce(e["source"], F.lit(""))).contains("codemeta")
                )
            )
            & e["result"]["value"].isNotNull(),
        )
    )
    lvl1["_evs_p019"] = guard("P019", p019_sel)
    ev["P019"] = F.concat(
        base("P019"), F.lit("codemeta.json downloadURL is outdated or invalid: "),
        F.coalesce(cols("_evs_p019")["result"]["value"], F.lit("unknown URL")),
    )

    p020_sel = _first_firing(
        M.codemeta_or_entries(cols("development_status")),
        lambda e: M.p020_is_url(M.string_value(e)),
    )
    lvl1["_evs_p020"] = guard("P020", p020_sel)
    lvl2["_evd_p020_val"] = M.string_value(cols("_evs_p020"))
    ev["P020"] = F.concat(
        base("P020"),
        F.lit("codemeta.json developmentStatus is a URL instead of status string: "),
        _q(cols("_evd_p020_val")),
    )

    # w021's entry loop never breaks, so the LAST firing entry's payload
    # survives (w021.py:29-54)
    w021_sel = _last_firing(
        F.filter(
            cols("authors"),
            lambda e: (e["technique"] == "code_parser") & M._source_is_metadata_cs(e),
        ),
        lambda e: F.coalesce(M.string_value(e), F.lit("")).rlike(
            r"\[[^\]\n]*,[^\]\n]*\]"
        ),
    )
    lvl1["_evs_w021"] = guard("W021", w021_sel)
    lvl2["_evd_w021_val"] = M.string_value(cols("_evs_w021"))
    ev["W021"] = F.concat(
        base("W021"),
        metadata_source_filename(cols("_evs_w021")["source"]),
        F.lit(" GivenName is a list instead of string: "),
        _q(cols("_evd_w021_val")),
    )

    def _p022_fires(e: Column) -> Column:
        up = F.upper(F.coalesce(M.string_value(e), F.lit("")))
        cond = F.lit(False)
        for fam, pat in M._P022_FAMILIES_FULL:
            hit = up.contains(fam)
            if pat is not None:
                hit = hit & ~up.rlike(pat)
            cond = cond | hit
        return cond

    # p022's entry loop never breaks either — LAST firing entry wins
    # (p022.py:37-61)
    p022_sel = _last_firing(
        F.filter(
            cols("license"),
            lambda e: (e["technique"] == "code_parser") & M._source_is_metadata_cs(e),
        ),
        _p022_fires,
    )
    lvl1["_evs_p022"] = guard("P022", p022_sel)
    lvl2["_evd_p022_val"] = M.string_value(cols("_evs_p022"))
    ev["P022"] = F.concat(
        base("P022"),
        metadata_source_filename(cols("_evs_p022")["source"]),
        F.lit(" License does not specify version: '"),
        _q(cols("_evd_p022_val")), F.lit("'"),
    )

    p023_sel = _first_firing(
        M.metadata_or_entries(cols("code_repository")),
        lambda e: M.p023_is_git_remote_shorthand(M.string_value(e)),
    )
    lvl1["_evs_p023"] = guard("P023", p023_sel)
    ev["P023"] = F.concat(
        base("P023"),
        metadata_source_filename(cols("_evs_p023")["source"]),
        F.lit(" codeRepository uses Git shorthand instead of full URL: '"),
        F.coalesce(M.string_value(cols("_evs_p023")), F.lit("unknown URL")),
        F.lit("'"),
    )

    p024_sel = _first_firing(
        M.codemeta_or_entries(cols("identifier")),
        lambda e: M.p024_is_bare_doi(M.string_value(e)),
    )
    lvl1["_evs_p024"] = guard("P024", p024_sel)
    lvl2["_evd_p024_val"] = M.string_value(cols("_evs_p024"))
    ev["P024"] = F.concat(
        base("P024"), F.lit("Identifier uses bare DOI instead of full URL: '"),
        _q(cols("_evd_p024_val")), F.lit("'"),
    )

    apis = F.filter(
        cols("code_repository"),
        lambda e: (e["technique"] == "GitHub_API") & e["result"]["value"].isNotNull(),
    )
    api_v = F.when(
        F.size(apis) > 0, F.try_element_at(apis, F.size(apis))["result"]["value"]
    )
    lvl1["_evs_p026"] = guard("P026", api_v)
    ev["P026"] = F.concat(
        base("P026"), F.lit("codeRepository points to different repository: "),
        F.coalesce(cols("_evs_p026"), F.lit("unknown URL")),
    )

    p027_cm = M.first_match(
        F.filter(
            cols("version"),
            lambda e: (
                F.coalesce(e["source"], F.lit("")).contains("codemeta.json")
                | (
                    (e["technique"] == "code_parser")
                    & F.lower(F.coalesce(e["source"], F.lit(""))).contains("codemeta")
                )
            )
            & e["result"]["value"].isNotNull(),
        )
    )["result"]["value"]
    lvl1["_evs_p027"] = guard("P027", p027_cm)
    ev["P027"] = F.concat(
        base("P027"), F.lit("codemeta.json version '"), _q(cols("_evs_p027")),
        F.lit("' does not match package version"),
    )

    p028_sel = _first_firing(
        M.codemeta_or_entries(cols("identifier")),
        lambda e: M.p028_is_raw_swhid(M.string_value(e)),
    )
    lvl1["_evs_p028"] = guard("P028", p028_sel)
    lvl2["_evd_p028_val"] = M.string_value(cols("_evs_p028"))
    ev["P028"] = F.concat(
        base("P028"),
        F.lit("codemeta Identifier uses raw SWHID without resolvable URL: '"),
        _q(cols("_evd_p028_val")), F.lit("'"),
    )

    return [lvl0, lvl1, lvl2], ev


TARGET_LANGUAGES = M.TARGET_LANGUAGES

# The summary shell's own wording (detect_pitfalls_main.py:62-253) — a
# THIRD description table, diverging from both json_ld_utils'
# get_pitfall_description and the JSON-LD process strings; W-rules use
# warning_code/warning_desc keys. Kept verbatim for analysis_results.json
# parity.


def extract_target_languages(langs_cat: Column) -> Column:
    """extract_programming_languages + normalize_language_name
    (pitfall_utils.py:5-60): value-first-else-name per entry, 'python*'
    prefix => Python, cpp variants => C++, exact-lower map for the rest,
    filtered to the target set, order-preserving dedup."""
    def norm(e: Column) -> Column:
        raw = F.trim(F.coalesce(e["result"]["value"], e["result"]["name"]))
        low = F.lower(raw)
        return (
            F.when(low.startswith("python"), F.lit("Python"))
            .when(low.isin("c++", "cpp", "cplusplus"), F.lit("C++"))
            .when(low == "java", F.lit("Java"))
            .when(low == "c", F.lit("C"))
            .when(low == "r", F.lit("R"))
            .when(low == "rust", F.lit("Rust"))
            .otherwise(raw)
        )

    names = F.transform(langs_cat, norm)
    return F.array_distinct(
        F.filter(
            names,
            lambda n: n.isNotNull() & (n != "") & n.isin(TARGET_LANGUAGES),
        )
    )


def language_extraction_crash(langs_cat: Column) -> Column:
    """True where the reference main loop's language extraction raises —
    a structured (non-string, truthy) language value hits .strip() in
    normalize_language_name, and the per-FILE handler skips the document
    entirely: no detectors run, no JSON-LD file, no summary contribution
    beyond the total (detect_pitfalls_main.py:293-299, :361-363)."""

    def _picked(e: Column) -> Column:
        return F.coalesce(e["result"]["value"], e["result"]["name"])

    return F.coalesce(
        F.exists(
            langs_cat,
            lambda e: _picked(e).isNotNull()
            & ~F.trim(_picked(e)).isin("", "[]", "{}")
            & (
                M._is_stringified_array(F.trim(_picked(e)))
                | M._is_stringified_object(F.trim(_picked(e)))
            ),
        ),
        F.lit(False),
    )


def corpus_summary(
    df: DataFrame, url_status_map: dict[str, int] | None = None
) -> dict:
    """The reference's analysis_results.json (detect_pitfalls_main.py:
    52-253 shell, :325-330 language tallies, :364-391 totals/percentages)
    over a nested corpus frame — ONE distributed aggregation (27 count
    exprs + 27x6 language-conditioned counts + totals, all map-side
    partial); only the single summary row reaches the driver, where
    percentages use Python round (banker's) exactly as json.dump saw
    them."""
    for cat in M.CORPUS_CATEGORIES:
        if cat not in df.columns:
            df = df.withColumn(cat, F.array().cast(f"array<{M.ENTRY_DDL}>"))
    lang_crash = language_extraction_crash(F.col("programming_languages"))
    flagged = (
        M.nested_rule_flags(df, url_status_map)
        .withColumn("_skip", lang_crash)
        .withColumn(
            "_langs",
            F.when(
                F.col("_skip"), F.array().cast("array<string>")
            ).otherwise(
                extract_target_languages(F.col("programming_languages"))
            ),
        )
    )
    ident = _first_value(F.col("identifier"))
    ident_crashes = ident.isNotNull() & (
        M._is_stringified_array(F.trim(ident))
        | M._is_stringified_object(F.trim(ident))
    )
    any_hit = F.lit(False)
    for code in CODES:
        any_hit = any_hit | F.col(f"hit_{code}")
    ok = ~F.col("_skip")
    aggs = [
        F.count(F.lit(1)).alias("_total"),
        F.sum(F.when(F.size("_langs") > 0, 1).otherwise(0)).alias("_with_langs"),
        F.sum(
            F.when(
                ok & any_hit & ~F.coalesce(ident_crashes, F.lit(False)), 1
            ).otherwise(0)
        ).alias("_files_created"),
    ]
    for code in CODES:
        aggs.append(
            F.sum(F.when(ok & F.col(f"hit_{code}"), 1).otherwise(0)).alias(
                f"_c_{code}"
            )
        )
        for lang in TARGET_LANGUAGES:
            aggs.append(
                F.sum(
                    F.when(
                        ok
                        & F.col(f"hit_{code}")
                        & F.array_contains("_langs", lang),
                        1,
                    ).otherwise(0)
                ).alias(f"_l_{code}_{lang}")
            )
    row = flagged.agg(*aggs).collect()[0].asDict()
    total = row["_total"]
    total_p = sum(row[f"_c_{c}"] for c in CODES if c.startswith("P"))
    total_w = sum(row[f"_c_{c}"] for c in CODES if c.startswith("W"))
    return {
        "summary": {
            "total_repositories_analyzed": total,
            "repositories_with_target_languages": row["_with_langs"],
            "individual_jsonld_files_created": row["_files_created"],
            "total_pitfalls_detected": total_p,
            "total_warnings_detected": total_w,
            "target_languages": list(TARGET_LANGUAGES),
        },
        "pitfalls & warnings": [
            {
                ("warning_code" if code.startswith("W") else "pitfall_code"): code,
                ("warning_desc" if code.startswith("W") else "pitfall_desc"):
                    SUMMARY_DESCRIPTIONS[code],
                "count": row[f"_c_{code}"],
                "percentage": round((row[f"_c_{code}"] / total) * 100, 2)
                if total > 0
                else 0.0,
                "languages": {
                    lang: row[f"_l_{code}_{lang}"]
                    for lang in TARGET_LANGUAGES
                    if row[f"_l_{code}_{lang}"] > 0
                },
            }
            for code in CODES
        ],
    }


def _first_value(cat: Column) -> Column:
    """First entry carrying a value (the extract_software_info pattern)."""
    return M.first_match(
        F.filter(cat, lambda e: e["result"]["value"].isNotNull())
    )["result"]["value"]


def assessed_software(df_cols: set[str]) -> Column:
    """assessedSoftware shell, json_ld_utils.py:357-400. to_json drops
    null struct fields, which reproduces the optional schema:identifier."""
    cols = F.col
    name = (
        _first_value(cols("full_name")) if "full_name" in df_cols else F.lit(None)
    )
    version = (
        F.try_element_at(cols("releases"), F.lit(1))["result"]["tag"]
        if "releases" in df_cols
        else F.lit(None)
    )
    url = (
        _first_value(cols("code_repository"))
        if "code_repository" in df_cols
        else F.lit(None)
    )
    ident = (
        _first_value(cols("identifier")) if "identifier" in df_cols else F.lit(None)
    )
    ident_id = F.when(
        ident.startswith("https://doi.org/"), ident
    ).when(ident.startswith("10."), F.concat(F.lit("https://doi.org/"), ident))
    return F.struct(
        F.lit("schema:SoftwareApplication").alias("@type"),
        F.coalesce(name, F.lit("Unknown")).alias("name"),
        F.coalesce(version, F.lit("Unknown")).alias("softwareVersion"),
        F.coalesce(url, F.lit("Unknown")).alias("url"),
        F.when(
            ident_id.isNotNull(), F.struct(ident_id.alias("@id"))
        ).alias("schema:identifier"),
    )


def nested_assessments(
    df: DataFrame,
    url_status_map: dict[str, int] | None = None,
    date_created: str = "1970-01-01T00:00:00Z",
    file_col: str = "_file",
) -> DataFrame:
    """(file, assessment) — one reference-shaped JSON-LD document per
    flagged document (create_pitfall_jsonld, json_ld_utils.py:462-508),
    built in one distributed projection. `license` reproduces the
    reference's set-literal typo (a one-element array). Documents whose
    first identifier value would crash the reference's startswith probe
    (structured value) are dropped, as the reference's caught exception
    drops them (detect_pitfalls_main.py:352-354)."""
    # normalize: every category the evidence expressions reference exists
    # (absent -> empty array), so missing-category documents analyze and
    # abstain exactly like F1
    df = df.withColumnRenamed(file_col, "_file")
    for cat in M.CORPUS_CATEGORIES:
        if cat not in df.columns:
            df = df.withColumn(cat, F.array().cast(f"array<{M.ENTRY_DDL}>"))
    # Document-level skips, applied BELOW the giant checks projection (a
    # filter added ABOVE it makes Catalyst's CollapseProject inline the
    # whole evidence expression tree into the predicate — minutes of
    # single-core optimizer time):
    # 1. the main loop's language extraction runs BEFORE the detectors; a
    #    crash there skips the whole document (no JSON-LD file)
    df = df.filter(~language_extraction_crash(F.col("programming_languages")))
    # 2. the reference's identifier startswith probe crashes on a
    #    structured first value -> document skipped
    ident_early = _first_value(F.col("identifier"))
    df = df.filter(
        ~F.coalesce(
            ident_early.isNotNull()
            & (
                M._is_stringified_array(F.trim(ident_early))
                | M._is_stringified_object(F.trim(ident_early))
            ),
            F.lit(False),
        )
    )
    flagged = M.nested_rule_flags(df, url_status_map)
    levels, ev = evidence_columns(url_status_map)
    # Each level materializes selector/derived subtrees as named columns
    # so the renders reference attributes instead of re-cloning the
    # trees (see evidence_columns docstring); CollapseProject keeps the
    # lower projections because their aliases are non-cheap and
    # multi-referenced, and the whole chain stays one narrow stage.
    for lvl in levels:
        if lvl:
            flagged = flagged.select(
                "*", *[c.alias(n) for n, c in lvl.items()]
            )
    # Task-binary discipline (round-5): the serialized stage plan must
    # carry the 27 evidence expression trees exactly ONCE — and, since
    # the level split above, each selector subtree once rather than the
    # 3-15 clones the _q/_pyrepr wrappers used to make (18.6 MiB -> see
    # TASKBINARY.json). The old shape inlined the full check structs
    # into BOTH the materialized `checks` column and the to_json(doc)
    # projection, and filter(size(checks)>0) substituted the tree a
    # third time via predicate pushdown — a 35.7 MiB broadcast task
    # binary per stage. (An explode + broadcast rule-text-dimension
    # join was measured WORSE: optimizer rules around Generate
    # re-duplicate the generator's child, 26.8 MiB and minutes of
    # fixpoint iteration.) So:
    # * the fired checks carry only (checkId, evidence) — array already
    #   in CODES order, no sort key needed;
    # * the static output fragments (indicator id / process /
    #   suggestion, jsonld_text tables = reference analog
    #   json_ld_utils.py:54-88,402-436 keyed by checkId) ship ONCE as a
    #   single ~11 KB map literal that a transform() lambda looks up
    #   per fired check — not re-rendered into 27 struct literals;
    # * zero-check documents are dropped by the cheap hit_* disjunction
    #   (tiny predicate trees), never by size(<giant array expr>) > 0.
    fired = F.filter(
        F.array(
            *[
                F.when(
                    F.col(f"hit_{code}"),
                    F.struct(
                        F.lit(code).alias("checkId"),
                        ev[code].alias("evidence"),
                    ),
                )
                for code in CODES
            ]
        ),
        lambda x: x.isNotNull(),
    )
    statics = F.create_map(
        *[
            part
            for code in CODES
            for part in (
                F.lit(code),
                F.struct(
                    F.lit(
                        "https://w3id.org/example/metacheck/i/indicators/"
                        + CATEGORIES[code]
                    ).alias("indicator"),
                    F.lit(DESCRIPTIONS[code]).alias("process"),
                    F.lit(SUGGESTIONS[code]).alias("suggestion"),
                ),
            )
        ]
    )

    def _render(c: Column) -> Column:
        t = F.element_at(statics, c["checkId"])
        return F.struct(
            F.lit("CheckResult").alias("@type"),
            F.struct(t["indicator"].alias("@id")).alias("assessesIndicator"),
            F.struct(
                F.lit("schema:SoftwareApplication").alias("@type"),
                F.lit("metacheck").alias("name"),
                F.lit("https://w3id.org/example/metacheck/tools/").alias("@id"),
                F.lit("0.1.0").alias("softwareVersion"),
            ).alias("checkingSoftware"),
            t["process"].alias("process"),
            F.struct(F.lit("schema:CompletedActionStatus").alias("@id")).alias(
                "status"
            ),
            c["checkId"].alias("checkId"),
            c["evidence"].alias("evidence"),
            t["suggestion"].alias("suggestion"),
        )

    checks = F.transform(fired, _render)
    cols_present = set(df.columns)
    name = _first_value(F.col("full_name"))
    desc = _first_value(F.col("description"))
    doc = F.struct(
        F.lit("https://w3id.org/example/metacheck/0.1.0/").alias("@context"),
        F.lit("SoftwareQualityAssessment").alias("@type"),
        F.concat(
            F.lit("Quality Assessment for "), F.coalesce(name, F.lit("Unknown"))
        ).alias("name"),
        F.coalesce(
            desc, F.lit("Software quality assessment for repository metadata")
        ).alias("description"),
        F.struct(
            F.lit("schema:Person").alias("@type"),
            F.lit("Anas El Hounsri").alias("name"),
            F.lit("a.elhounsri@upm.com").alias("email"),
        ).alias("creator"),
        F.lit(date_created).alias("dateCreated"),
        F.array(F.lit("@id: https://opensource.org/license/mit")).alias("license"),
        assessed_software(cols_present).alias("assessedSoftware"),
        checks.alias("checks"),
    )
    # Zero-check documents are dropped AFTER rendering, in an
    # Arrow-batched suffix probe on the OUTPUT string: `checks` is the
    # document's last field, so an empty array renders as a literal
    # `"checks":[]}` tail (a non-empty array always ends `}]}`, and no
    # text inside the array can fake the suffix — the char before the
    # final `}` must be `[`). Every declarative formulation of this drop
    # was measured to bloat the serialized stage: a flag-derived
    # predicate (any_hit / size(checks) > 0) either gets the 27
    # rule/evidence trees re-rendered into the Filter via alias
    # substitution or — when pinned above with a nondeterministic
    # barrier — splits the collapsed projection in two (~1.8 MiB task
    # binary), and a suffix predicate above the collapsed projection
    # re-serializes it wholesale (~19 MiB); the single collapsed
    # projection with NO Catalyst filter above it stays under the 1 MiB
    # broadcast-warning line. mapInPandas is a hard optimizer barrier,
    # its input is the rendered output itself (the same bytes the S5
    # sink writes next), and the probe is a vectorized str.endswith —
    # the same row set as before, one output-sized Arrow hop.
    out = flagged.select(
        F.col("_file").alias("file"), F.to_json(doc).alias("assessment")
    )

    def _drop_empty(batches):
        for pdf in batches:
            yield pdf[~pdf["assessment"].str.endswith('"checks":[]}')]

    return out.mapInPandas(_drop_empty, "file string, assessment string")
