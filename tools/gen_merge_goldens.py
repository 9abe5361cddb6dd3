"""Generate merge-layer goldens: original synthetic resultsets (structural
variants mirroring the reference's demo fixtures, with our own vocabulary),
run through the REFERENCE merge pipeline (loader -> merge -> postprocessors)
under several settings combos. Scenarios avoid spaCy-dependent analyzers
(those are deterministic replacements tested separately).

Writes src/test/resources/graft/golden/merge/<scenario>/{config.json,
input_run<i>_<paper>.json, expected_<paper>.json}.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import ref_stub_env

ref_stub_env.install()

from tablevalidate.schema import TablesFile  # noqa: E402
from tablemerge.tablesfile_loader import TablesFileLoader  # noqa: E402
from tablemerge.tablesfile_merger import TablesFileMerger  # noqa: E402
from tablemerge.agreement import SimpleCountAgreement, DistinctReadersAgreement  # noqa: E402
from tablemerge.analyzers import (  # noqa: E402
    HintsLoadTimeAnalyzer, AliasLoadTimeAnalyzer, JaccardMergeTimeAnalyzer)
from tablemerge.fragment_transformer import (  # noqa: E402
    FilterTitleRowsTransformer, FilterEmptyRowsTransformer,
    LeadingRowNumberTransformer, NormalizePunctuationTransformer,
    FilterHeaderRowsTransformer)
from tablemerge.tablesfile_transformer import (  # noqa: E402
    NullTablesfileTransformer, FragmentsExploder,
    SafeConsecutiveFragmentsCompactor, UnsafeConsecutiveFragmentsCompactor)
from tablemerge.postprocessor import build_postprocessors  # noqa: E402
from utils.column_schema import ColumnSchema  # noqa: E402

OUT = '/root/repo/src/test/resources/graft/golden/merge'

# ---------------------------------------------------------------- fixtures

def frag(rows, page):
    return {"rows": rows, "page": page}


def tf(tables, citation=None, filename="paper.html"):
    return {"tables": tables, "citation": citation,
            "metadata": {"filename": filename}}


SEM_ROWS_P5 = [
    {"scientific_name": "Vulpes lucerna", "common_name": "Lantern Fox",
     "status": "stable", "estimated_population": "1,200"},
    {"scientific_name": "Rana vitrea", "common_name": "Glass Frog",
     "status": "declining", "estimated_population": "85"},
    {"scientific_name": "Bubo prunae", "common_name": "Ember Owl",
     "status": "endangered", "estimated_population": "42"},
]
SEM_ROWS_P6 = [
    {"scientific_name": "Cyprinus speculum", "common_name": "Mirror Carp",
     "status": "stable", "estimated_population": "3,400"},
    {"scientific_name": "Tinea crepusculi", "common_name": "Dusk Moth",
     "status": "unknown", "estimated_population": "no data"},
]

# run B: same data, minor variations (case/whitespace/accents) + an extra row
SEM_ROWS_P5_B = [
    {"scientific_name": "  Vulpes   lucerna ", "common_name": "lantern fox",
     "status": "Stable", "estimated_population": "1,200"},
    {"scientific_name": "Rana vítrea", "common_name": "Glass Frog",
     "status": "declining", "estimated_population": "85"},
    {"scientific_name": "Bubo prunae", "common_name": "Ember Owl",
     "status": "endangered", "estimated_population": "42"},
    {"scientific_name": "Sorex stratae", "common_name": "Straße Shrew",
     "status": "stable", "estimated_population": "7"},
]

# numeric-named variant of the same data (Jaccard alignment target)
NUM_ROWS_P5 = [
    {"0": "Vulpes lucerna", "1": "Lantern Fox", "2": "stable", "3": "1,200"},
    {"0": "Rana vitrea", "1": "Glass Frog", "2": "declining", "3": "85"},
    {"0": "Bubo prunae", "1": "Ember Owl", "2": "endangered", "3": "42"},
]

# header-in-first-row variant (hints alignment target)
HDR_ROWS_P5 = [
    {"0": "Common Name", "1": "Scientific Name", "2": "Status"},
    {"0": "Lantern Fox", "1": "Vulpes lucerna", "2": "stable"},
    {"0": "Glass Frog", "1": "Rana vitrea", "2": "declining"},
]

TITLED_ROWS = [
    {"a": "Table 3", "b": "", "c": ""},
    {"a": "1. Vulpes lucerna", "b": "«stable»", "c": "x—y"},
    {"a": "2. Rana vitrea", "b": "“declining”", "c": "it’s"},
    {"a": "3. Bubo prunae", "b": "unknown…", "c": "fine."},
    {"a": "", "b": "", "c": ""},
]

SCENARIOS = {}

SCENARIOS['basic'] = {
    "settings": {},
    "papers": {
        "overview": [
            tf([{"table_fragments": [frag(SEM_ROWS_P5, 5), frag(SEM_ROWS_P6, 6)]}],
               citation="Imaginary Atlas — first edition", filename="overview.html"),
            tf([{"table_fragments": [frag(SEM_ROWS_P5_B, 5), frag(SEM_ROWS_P6, 6)]}],
               citation="Imaginary Atlas, 2nd ed.", filename="overview.html"),
            tf([{"table_fragments": [frag(SEM_ROWS_P5, 5)]}],
               citation=None, filename="overview.html"),
        ],
    },
    "uuids": ["run-a", "run-b", "run-c"],
    "offsets": [0, 0, 0],
}

SCENARIOS['jaccard'] = {
    "settings": {"use_jaccard": True},
    "papers": {
        "overview": [
            tf([{"table_fragments": [frag(SEM_ROWS_P5, 5)]}], filename="overview.html"),
            tf([{"table_fragments": [frag(NUM_ROWS_P5, 5)]}], filename="overview.html"),
        ],
    },
    "uuids": ["run-sem", "run-num"],
    "offsets": [0, 0],
}

SCENARIOS['hints'] = {
    "settings": {"hints": ["common_name", "scientific_name", "status"],
                  "hints_mode": "safe", "remove_header_rows": True},
    "papers": {
        "overview": [
            tf([{"table_fragments": [frag(HDR_ROWS_P5, 5)]}], filename="overview.html"),
            tf([{"table_fragments": [frag(SEM_ROWS_P5, 5)]}], filename="overview.html"),
        ],
    },
    "uuids": ["run-hdr", "run-sem"],
    "offsets": [0, 0],
}

SCENARIOS['aliases'] = {
    "settings": {"aliases": {"Nombre Científico": "scientific_name",
                              "población": "estimated_population",
                              "notas": "<remove>"}},
    "papers": {
        "overview": [
            tf([{"table_fragments": [frag([
                {"nombre científico": "Vulpes lucerna", "población": "1,200", "notas": "x"},
                {"nombre científico": "Rana vitrea", "población": "85", "notas": "y"},
            ], 5)]}], filename="overview.html"),
            tf([{"table_fragments": [frag(
                [{"scientific_name": "Vulpes lucerna", "estimated_population": "1,200"},
                 {"scientific_name": "Rana vitrea", "estimated_population": "85"}], 5)]}],
               filename="overview.html"),
        ],
    },
    "uuids": ["run-es", "run-en"],
    "offsets": [0, 0],
}

SCENARIOS['schema'] = {
    "settings": {"schema": "scientific_name:str estimated_population:int status:str",
                  "filter_columns": True, "order_columns": True, "coerce_types": True},
    "papers": {
        "overview": [
            tf([{"table_fragments": [frag([
                {"common_name": "Lantern Fox", "estimated_population": "1200.0",
                 "scientific_name": "Vulpes lucerna", "status": "stable"},
                {"common_name": "Glass Frog", "estimated_population": "8.5e1",
                 "scientific_name": "Rana vitrea", "status": "declining"},
            ], 5)]},
                {"table_fragments": [frag([
                    {"unrelated": "keep-away", "other": "1"},
                ], 9)]}],
               filename="overview.html"),
        ],
    },
    "uuids": ["run-a"],
    "offsets": [0],
}

SCENARIOS['punct'] = {
    "settings": {"normalize_punctuation": True, "strip_leading_row_numbers": True},
    "papers": {
        "titled": [
            tf([{"table_fragments": [frag(TITLED_ROWS, 2)]}], filename="titled.html"),
        ],
    },
    "uuids": ["run-a"],
    "offsets": [0],
}

SCENARIOS['compact_safe'] = {
    "settings": {"transform_tablesfile": "compact-safe"},
    "papers": {
        "overview": [
            tf([
                {"rows": SEM_ROWS_P5, "page": 5},
                {"rows": SEM_ROWS_P6, "page": 6},
                {"rows": [{"x": "far away"}], "page": 20},
            ], filename="overview.html"),
        ],
    },
    "uuids": ["run-a"],
    "offsets": [0],
}

SCENARIOS['explode'] = {
    "settings": {"transform_tablesfile": "explode"},
    "papers": {
        "overview": [
            tf([{"table_fragments": [frag(SEM_ROWS_P5, 5), frag(SEM_ROWS_P6, 6)]}],
               filename="overview.html"),
        ],
    },
    "uuids": ["run-a"],
    "offsets": [0],
}

SCENARIOS['offsets'] = {
    "settings": {},
    "papers": {
        "overview": [
            tf([{"table_fragments": [frag(SEM_ROWS_P5, 5)]}], filename="overview.html"),
            tf([{"table_fragments": [frag(SEM_ROWS_P5, 1)]}], filename="overview.html"),
        ],
    },
    "uuids": ["run-a", "run-b"],
    "offsets": [0, 4],  # run-b page 1 + 4 == run-a page 5 -> same cluster
}

SCENARIOS['distinct_readers'] = {
    "settings": {"agreement_method": "distinct-readers",
                  "readers": {"run-a": "pdfplumber", "run-b": "pymupdf",
                               "run-c": "gemini-2.5-pro"}},
    "papers": {
        "overview": [
            tf([{"table_fragments": [frag(SEM_ROWS_P5, 5)]}], filename="overview.html"),
            tf([{"table_fragments": [frag(SEM_ROWS_P5, 5)]}], filename="overview.html"),
            tf([{"table_fragments": [frag(SEM_ROWS_P5, 5)]}], filename="overview.html"),
        ],
    },
    "uuids": ["run-a", "run-b", "run-c"],
    "offsets": [0, 0, 0],
}

SCENARIOS['column_agreement'] = {
    "settings": {"column_agreement": True},
    "papers": {
        "overview": [
            tf([{"table_fragments": [frag(SEM_ROWS_P5, 5)]}], filename="overview.html"),
            tf([{"table_fragments": [frag(SEM_ROWS_P5_B, 5)]}], filename="overview.html"),
        ],
    },
    "uuids": ["run-a", "run-b"],
    "offsets": [0, 0],
}


def build_pipeline(cfg):
    pretransformers = []
    if cfg.get("filter_title_rows", True):
        pretransformers.append(FilterTitleRowsTransformer())
    if cfg.get("strip_leading_row_numbers"):
        pretransformers.append(LeadingRowNumberTransformer())
    if cfg.get("normalize_punctuation"):
        pretransformers.append(NormalizePunctuationTransformer())
    pretransformers.append(FilterEmptyRowsTransformer())

    load_analyzers = []
    if cfg.get("hints_mode") and cfg.get("hints"):
        load_analyzers.append(HintsLoadTimeAnalyzer(cfg["hints"], safe=cfg["hints_mode"] == "safe"))
    if cfg.get("aliases"):
        load_analyzers.append(AliasLoadTimeAnalyzer(cfg["aliases"]))

    schema = ColumnSchema.parse(cfg["schema"]) if cfg.get("schema") else None

    merge_analyzers = []
    if cfg.get("use_jaccard"):
        merge_analyzers.append(JaccardMergeTimeAnalyzer(cfg.get("threshold", 0.5), schema))

    posttransformers = []
    if cfg.get("remove_header_rows"):
        posttransformers.append(FilterHeaderRowsTransformer(cfg.get("hints", [])))

    transformer = {
        "explode": FragmentsExploder(),
        "compact-safe": SafeConsecutiveFragmentsCompactor(),
        "compact-unsafe": UnsafeConsecutiveFragmentsCompactor(),
    }.get(cfg.get("transform_tablesfile"), NullTablesfileTransformer())

    postprocessors = build_postprocessors(
        schema,
        cfg.get("filter_columns", False),
        cfg.get("order_columns", False),
        cfg.get("coerce_types", False),
        only_semantic_columns=cfg.get("only_semantic_columns", False),
        drop_empty_columns=cfg.get("drop_empty_columns", True),
        drop_empty_tables=cfg.get("drop_empty_tables", True))

    agreement = (DistinctReadersAgreement(cfg["readers"])
                 if cfg.get("agreement_method") == "distinct-readers"
                 else SimpleCountAgreement())

    loader = TablesFileLoader(
        pretransformers=pretransformers,
        tablesfile_transformer=transformer,
        analyzers=load_analyzers,
        posttransformers=posttransformers)
    merger = TablesFileMerger(
        agreement=agreement,
        column_agreement=cfg.get("column_agreement", False),
        analyzers=merge_analyzers)
    return loader, merger, postprocessors


def main():
    import tempfile
    for name, sc in SCENARIOS.items():
        d = f'{OUT}/{name}'
        os.makedirs(d, exist_ok=True)
        cfg = dict(sc["settings"])
        with open(f'{d}/config.json', 'w', encoding='utf-8') as f:
            json.dump({"settings": cfg, "uuids": sc["uuids"], "offsets": sc["offsets"]},
                      f, ensure_ascii=False, indent=2)
        loader, merger, postprocessors = build_pipeline(cfg)
        for paper, runs in sc["papers"].items():
            docs, offsets = [], []
            for i, doc in enumerate(runs):
                with open(f'{d}/input_run{i}_{paper}.json', 'w', encoding='utf-8') as f:
                    json.dump(doc, f, ensure_ascii=False, indent=2)
                with tempfile.NamedTemporaryFile('w', suffix='.json', delete=False,
                                                  encoding='utf-8') as tmp:
                    json.dump(doc, tmp, ensure_ascii=False)
                    tmp_path = tmp.name
                from pathlib import Path
                loaded = loader.load(Path(tmp_path))
                os.unlink(tmp_path)
                loaded.uuid = sc["uuids"][i]
                docs.append(loaded)
                offsets.append(sc["offsets"][i])
            merged = merger.merge(docs, page_offsets=offsets)
            for pp in postprocessors:
                merged = pp.postprocess(merged)
            with open(f'{d}/expected_{paper}.json', 'w', encoding='utf-8') as f:
                f.write(json.dumps(merged.model_dump(), ensure_ascii=False))
        print(f'{name}: ok')


if __name__ == '__main__':
    main()
