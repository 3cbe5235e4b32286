"""JSON-LD document parity: execute the reference's create_pitfall_jsonld
(with its own detectors, frozen HTTP) over the shipped corpus and
deep-compare every generated assessment document against
metacheck_spark.sources.jsonld.nested_assessments — modulo dateCreated,
which the reference stamps with utcnow.

Usage: python tools/ref_jsonld_parity.py [max_diffs_to_print]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REF_SRC = "/root/reference/src"
CORPUS = os.path.join(REF_SRC, "metacheck/somef_outputs")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

DATE_SENTINEL = "1970-01-01T00:00:00Z"


def reference_docs() -> dict[str, dict]:
    """file name -> JSON-LD dict the reference pipeline would write."""
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

    from metacheck.detect_pitfalls_main import detect_all_pitfalls  # noqa: F401
    from metacheck.utils import json_ld_utils as J

    # pin the reference's utcnow stamp
    class _FixedDT:
        @staticmethod
        def utcnow():
            import datetime as _dt

            return _dt.datetime(1970, 1, 1)

    J.datetime = _FixedDT

    import metacheck.detect_pitfalls_main as main_mod

    detectors = main_mod.detect_all_pitfalls.__globals__  # noqa: F841

    # replicate the per-file loop of detect_all_pitfalls (:292-354) without
    # filesystem writes
    pairs = [
        (main_mod.detect_version_mismatch, "P001"),
        (main_mod.detect_license_template_placeholders, "P002"),
        (main_mod.detect_unversioned_requirements, "W003"),
        (main_mod.detect_outdated_datemodified, "W004"),
        (main_mod.detect_multiple_authors_single_field_pitfall, "P005"),
        (main_mod.detect_readme_homepage_pitfall, "P006"),
        (main_mod.detect_reference_publication_archive_pitfall, "P007"),
        (main_mod.detect_local_file_license_pitfall, "P008"),
        (main_mod.detect_programming_language_no_version_pitfall, "W010"),
        (main_mod.detect_citation_missing_reference_publication_pitfall, "P011"),
        (main_mod.detect_multiple_requirements_string_warning, "W012"),
        (main_mod.detect_invalid_software_requirement_pitfall, "P013"),
        (main_mod.detect_identifier_name_warning, "W014"),
        (main_mod.detect_empty_identifier_warning, "W015"),
        (main_mod.detect_coderepository_homepage_pitfall, "P016"),
        (main_mod.detect_copyright_only_license, "P017"),
        (main_mod.detect_issue_tracker_format_pitfall, "P018"),
        (main_mod.detect_outdated_download_url_pitfall, "P019"),
        (main_mod.detect_development_status_url_pitfall, "P020"),
        (main_mod.detect_author_name_list_warning, "W021"),
        (main_mod.detect_license_no_version_pitfall, "P022"),
        (main_mod.detect_git_remote_shorthand_pitfall, "P023"),
        (main_mod.detect_bare_doi_pitfall, "P024"),
        (main_mod.detect_ci_404_pitfall, "P025"),
        (main_mod.detect_different_repository_pitfall, "P026"),
        (main_mod.detect_codemeta_version_mismatch_pitfall, "P027"),
        (main_mod.detect_raw_swhid_pitfall, "P028"),
    ]

    from metacheck.utils.pitfall_utils import extract_programming_languages

    out: dict[str, dict] = {}
    for fp in sorted(glob.glob(os.path.join(CORPUS, "*.json"))):
        name = os.path.basename(fp)
        try:
            with open(fp) as f:
                somef_data = json.load(f)
        except (json.JSONDecodeError, UnicodeDecodeError):
            continue
        # the main loop extracts languages BEFORE the detectors; a crash
        # there hits the per-FILE handler and skips the document entirely
        # (detect_pitfalls_main.py:293-299)
        try:
            extract_programming_languages(somef_data)
        except Exception:
            continue
        results = []
        for fn, code in pairs:
            try:
                r = fn(somef_data, name)
                r["pitfall_code"] = code
                results.append(r)
            except Exception:
                continue
        if not any(
            r.get("has_pitfall", False) or r.get("has_warning", False)
            for r in results
        ):
            continue
        try:
            doc = J.create_pitfall_jsonld(somef_data, results, name)
            doc = J.convert_sets_to_lists(doc)
            doc["dateCreated"] = DATE_SENTINEL
            out[name] = doc
        except Exception:
            continue
    return out


def spark_docs() -> dict[str, dict]:
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from metacheck_spark import get_spark
    from metacheck_spark.fixtures.gen_images import url_status_map
    from metacheck_spark.rules.somef import CORPUS_CATEGORIES, ENTRY_DDL
    from metacheck_spark.sources.jsonld import nested_assessments
    from metacheck_spark.sources.readers import read_json_dir

    spark = get_spark(master="local[8]", shuffle_partitions=8, app_name="jsonldparity")
    schema = StructType.fromDDL(
        ", ".join(f"{c} array<{ENTRY_DDL}>" for c in CORPUS_CATEGORIES)
    )
    docs = read_json_dir(spark, CORPUS, schema, multiline=True).withColumn(
        "_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    rows = nested_assessments(
        docs, url_status_map(), date_created=DATE_SENTINEL
    ).collect()
    return {r["file"]: json.loads(r["assessment"]) for r in rows}


def _diff(a, b, path="$"):
    if type(a) is not type(b):
        yield f"{path}: type {type(a).__name__} != {type(b).__name__} ({a!r} vs {b!r})"
    elif isinstance(a, dict):
        for k in sorted(set(a) | set(b)):
            if k not in a:
                yield f"{path}.{k}: only in spark ({b[k]!r})"
            elif k not in b:
                yield f"{path}.{k}: only in ref ({a[k]!r})"
            else:
                yield from _diff(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, list):
        if len(a) != len(b):
            yield f"{path}: len {len(a)} != {len(b)}"
        for i, (x, y) in enumerate(zip(a, b)):
            yield from _diff(x, y, f"{path}[{i}]")
    elif a != b:
        yield f"{path}: {a!r} != {b!r}"


def main() -> int:
    limit = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    ref = reference_docs()
    ours = spark_docs()
    print(f"docs: ref={len(ref)} spark={len(ours)}")
    only_ref = sorted(set(ref) - set(ours))
    only_spark = sorted(set(ours) - set(ref))
    if only_ref:
        print(f"only in ref ({len(only_ref)}): {only_ref[:6]}")
    if only_spark:
        print(f"only in spark ({len(only_spark)}): {only_spark[:6]}")
    n_bad = 0
    printed = 0
    by_code: dict[str, int] = {}
    for name in sorted(set(ref) & set(ours)):
        diffs = list(_diff(ref[name], ours[name]))
        if diffs:
            n_bad += 1
            for d in diffs:
                import re as _re

                m = _re.search(r"checks\[(\d+)\]", d)
                code = "shell"
                if m:
                    try:
                        code = ref[name]["checks"][int(m.group(1))]["checkId"]
                    except Exception:
                        code = "checks?"
                by_code[code] = by_code.get(code, 0) + 1
            if printed < limit:
                print(f"== {name}")
                for d in diffs[:6]:
                    print(f"   {d}")
                printed += 1
    if by_code:
        print("mismatch tally by check:", dict(sorted(by_code.items(), key=lambda kv: -kv[1])))
    total_mismatch = n_bad + len(only_ref) + len(only_spark)
    print(
        f"docs compared: {len(set(ref) & set(ours))}, mismatched: {n_bad}, "
        f"total problems: {total_mismatch}"
    )
    return 0 if total_mismatch == 0 else 1





def reference_summary() -> dict:
    """Run the reference's detect_all_pitfalls end-to-end (frozen HTTP,
    tmp output dirs) and return its analysis_results.json."""
    import pathlib
    import tempfile

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

    from metacheck.detect_pitfalls_main import detect_all_pitfalls

    with tempfile.TemporaryDirectory() as td:
        out = pathlib.Path(td) / "analysis_results.json"
        files = sorted(pathlib.Path(CORPUS).glob("*.json"))
        import contextlib
        import io

        with contextlib.redirect_stdout(io.StringIO()):
            detect_all_pitfalls(files, pathlib.Path(td) / "pitfalls", out)
        return json.loads(out.read_text())


def spark_summary() -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from metacheck_spark import get_spark
    from metacheck_spark.fixtures.gen_images import url_status_map
    from metacheck_spark.rules.somef import CORPUS_CATEGORIES, ENTRY_DDL
    from metacheck_spark.sources.jsonld import corpus_summary
    from metacheck_spark.sources.readers import read_json_dir

    spark = get_spark(master="local[8]", shuffle_partitions=8, app_name="sumparity")
    schema = StructType.fromDDL(
        ", ".join(f"{c} array<{ENTRY_DDL}>" for c in CORPUS_CATEGORIES)
    )
    docs = read_json_dir(spark, CORPUS, schema, multiline=True).withColumn(
        "_file", F.element_at(F.split(F.input_file_name(), "/"), -1)
    )
    return corpus_summary(docs, url_status_map())


def summary_main() -> int:
    ref = reference_summary()
    ours = spark_summary()
    diffs = list(_diff(ref, ours))
    for d in diffs[:40]:
        print(d)
    print(f"summary diffs: {len(diffs)}")
    return 0 if not diffs else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "summary":
        raise SystemExit(summary_main())
    raise SystemExit(main())
