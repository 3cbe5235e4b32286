"""Per-document parity harness: execute the reference's own pure-Python
detectors over its shipped 899-doc SoMEF corpus (HTTP frozen to the
fixtures url_status_map so P013/P025 are deterministic), run
`nested_rule_flags` over the same files, and print a per-rule confusion
summary plus mismatched file names.

This is the strongest available oracle — the reference code IS the spec —
and arbitrates every entry-filter case-sensitivity quirk empirically.

Usage: python tools/ref_exec_parity.py [RULE ...]   (default: all 27)
"""

from __future__ import annotations

import glob
import json
import os
import sys

REF_SRC = "/root/reference/src"
CORPUS = os.path.join(REF_SRC, "metacheck/somef_outputs")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def reference_flags() -> dict[str, dict[str, bool]]:
    """file name -> {rule code -> fired} via the reference detectors."""
    sys.path.insert(0, REF_SRC)
    import requests

    from metacheck_spark.fixtures.gen_images import url_status_map

    status = url_status_map()

    class _Resp:
        def __init__(self, code: int):
            self.status_code = code

    def _frozen_get(url, *a, **k):
        code = status.get(url)
        if code is None or code < 0:
            raise requests.exceptions.RequestException("frozen: unknown url")
        return _Resp(code)

    requests.get = _frozen_get

    from metacheck.scripts.p001 import detect_version_mismatch
    from metacheck.scripts.p002 import detect_license_template_placeholders
    from metacheck.scripts.p005 import detect_multiple_authors_single_field_pitfall
    from metacheck.scripts.p006 import detect_readme_homepage_pitfall
    from metacheck.scripts.p007 import detect_reference_publication_archive_pitfall
    from metacheck.scripts.p008 import detect_local_file_license_pitfall
    from metacheck.scripts.p011 import (
        detect_citation_missing_reference_publication_pitfall,
    )
    from metacheck.scripts.p013 import detect_invalid_software_requirement_pitfall
    from metacheck.scripts.p016 import detect_coderepository_homepage_pitfall
    from metacheck.scripts.p017 import detect_copyright_only_license
    from metacheck.scripts.p018 import detect_issue_tracker_format_pitfall
    from metacheck.scripts.p019 import detect_outdated_download_url_pitfall
    from metacheck.scripts.p020 import detect_development_status_url_pitfall
    from metacheck.scripts.p022 import detect_license_no_version_pitfall
    from metacheck.scripts.p023 import detect_git_remote_shorthand_pitfall
    from metacheck.scripts.p024 import detect_bare_doi_pitfall
    from metacheck.scripts.p025 import detect_ci_404_pitfall
    from metacheck.scripts.p026 import detect_different_repository_pitfall
    from metacheck.scripts.p027 import detect_codemeta_version_mismatch_pitfall
    from metacheck.scripts.p028 import detect_raw_swhid_pitfall
    from metacheck.scripts.w003 import detect_unversioned_requirements
    from metacheck.scripts.w004 import detect_outdated_datemodified
    from metacheck.scripts.w010 import detect_programming_language_no_version_pitfall
    from metacheck.scripts.w012 import detect_multiple_requirements_string_warning
    from metacheck.scripts.w014 import detect_identifier_name_warning
    from metacheck.scripts.w015 import detect_empty_identifier_warning
    from metacheck.scripts.w021 import detect_author_name_list_warning

    detectors = [
        (detect_version_mismatch, "P001"),
        (detect_license_template_placeholders, "P002"),
        (detect_unversioned_requirements, "W003"),
        (detect_outdated_datemodified, "W004"),
        (detect_multiple_authors_single_field_pitfall, "P005"),
        (detect_readme_homepage_pitfall, "P006"),
        (detect_reference_publication_archive_pitfall, "P007"),
        (detect_local_file_license_pitfall, "P008"),
        (detect_programming_language_no_version_pitfall, "W010"),
        (detect_citation_missing_reference_publication_pitfall, "P011"),
        (detect_multiple_requirements_string_warning, "W012"),
        (detect_invalid_software_requirement_pitfall, "P013"),
        (detect_identifier_name_warning, "W014"),
        (detect_empty_identifier_warning, "W015"),
        (detect_coderepository_homepage_pitfall, "P016"),
        (detect_copyright_only_license, "P017"),
        (detect_issue_tracker_format_pitfall, "P018"),
        (detect_outdated_download_url_pitfall, "P019"),
        (detect_development_status_url_pitfall, "P020"),
        (detect_author_name_list_warning, "W021"),
        (detect_license_no_version_pitfall, "P022"),
        (detect_git_remote_shorthand_pitfall, "P023"),
        (detect_bare_doi_pitfall, "P024"),
        (detect_ci_404_pitfall, "P025"),
        (detect_different_repository_pitfall, "P026"),
        (detect_codemeta_version_mismatch_pitfall, "P027"),
        (detect_raw_swhid_pitfall, "P028"),
    ]

    out: dict[str, dict[str, bool]] = {}
    for fp in sorted(glob.glob(os.path.join(CORPUS, "*.json"))):
        name = os.path.basename(fp)
        try:
            with open(fp) as f:
                data = json.load(f)
        except (json.JSONDecodeError, UnicodeDecodeError):
            continue
        row = {}
        for fn, code in detectors:
            try:
                r = fn(data, name)
                row[code] = bool(r.get("has_pitfall") or r.get("has_warning"))
            except Exception as exc:  # detector crash = data shape quirk
                row[code] = False
                row.setdefault("_errs", []).append(f"{code}:{exc!r}")
        out[name] = row
    return out


def spark_flags() -> dict[str, dict[str, bool]]:
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from metacheck_spark import get_spark
    from metacheck_spark.fixtures.gen_images import url_status_map
    from metacheck_spark.rules.somef import CORPUS_CATEGORIES, nested_rule_flags
    from metacheck_spark.sources.readers import read_json_dir

    from metacheck_spark.rules.somef import ENTRY_DDL

    spark = get_spark(master="local[8]", shuffle_partitions=8, app_name="refparity")
    schema = StructType.fromDDL(
        ", ".join(f"{c} array<{ENTRY_DDL}>" for c in CORPUS_CATEGORIES)
    )
    docs = read_json_dir(spark, CORPUS, schema, multiline=True).withColumn(
        "_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    flagged = nested_rule_flags(docs, url_status_map())
    hit_cols = [c for c in flagged.columns if c.startswith("hit_")]
    rows = flagged.select("_file", *hit_cols).collect()
    return {
        r["_file"]: {c[4:]: bool(r[c]) for c in hit_cols} for r in rows
    }


def main() -> int:
    want = set(sys.argv[1:])
    ref = reference_flags()
    ours = spark_flags()
    codes = sorted(
        {c for row in ref.values() for c in row if not c.startswith("_")}
    )
    if want:
        codes = [c for c in codes if c in want]
    common = sorted(set(ref) & set(ours))
    print(f"docs: ref={len(ref)} spark={len(ours)} common={len(common)}")
    total_mm = 0
    for code in codes:
        tp = fp = fn = tn = 0
        mism = []
        for name in common:
            r, o = ref[name].get(code, False), ours[name].get(code, False)
            if r and o:
                tp += 1
            elif not r and not o:
                tn += 1
            elif o:
                fp += 1
                mism.append(f"+{name}")
            else:
                fn += 1
                mism.append(f"-{name}")
        total_mm += fp + fn
        status = "OK " if fp + fn == 0 else "DIFF"
        print(
            f"{status} {code}: ref={tp + fn:4d} ours={tp + fp:4d} "
            f"fp={fp:3d} fn={fn:3d}"
            + ("" if not mism else "  " + " ".join(mism[:8]))
        )
    errs = {n: r["_errs"] for n, r in ref.items() if "_errs" in r}
    if errs:
        print(f"reference detector errors in {len(errs)} docs:")
        for n, e in list(errs.items())[:5]:
            print(f"  {n}: {e}")
    print(f"TOTAL per-doc flag mismatches: {total_mm}")
    return 0 if total_mm == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
