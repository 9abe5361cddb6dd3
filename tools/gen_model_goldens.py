"""Generate model round-trip goldens: original synthetic .tables.json inputs
plus the reference's canonical compact serialization of each
(TablesFile.model_validate(...).model_dump() -> json.dumps(ensure_ascii=False)).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import ref_stub_env

ref_stub_env.install()

from tablevalidate.schema import TablesFile  # noqa: E402

OUT = '/root/repo/src/test/resources/graft/golden/model'

DOCS = {
    # plain semantic columns, rows-form table
    'birds_a': {
        "tables": [
            {"rows": [
                {"species": "Corvus fabulosus", "habitat": "montane cliffs", "count": "120"},
                {"species": "Pica luminosa", "habitat": "river valleys", "count": "85"},
            ], "page": 1},
        ],
        "citation": "Nguyen, T. (2031). Imaginary corvids of the north. J. Synth. Orn.",
        "metadata": {"filename": "birds_a.pdf"},
        "uuid": "11111111-aaaa-bbbb-cccc-000000000001",
    },
    # fragments-form, numeric column names, multi-value cells, metadata extras
    'birds_b': {
        "tables": [
            {"table_fragments": [
                {"rows": [
                    {"0": "Corvus fabulosus", "1": "montane cliffs",
                     "2": [{"value": "120", "agreement_level": 2},
                            {"value": "118", "agreement_level": 1}]},
                    {"0": "", "1": None, "2": "no data"},
                ], "page": 3},
                {"rows": [
                    {"0": "Pica luminosa", "1": "river valleys", "2": "85",
                     "agreement_level_": 2, "sources_": ["run-x", "run-y"], "row_": 7},
                ], "page": 4},
            ]},
        ],
        "citation": [{"value": "Citation alpha", "agreement_level": 1},
                      {"value": "Citación beta—dashes", "agreement_level": 3}],
        "metadata": {"filename": "birds_b.pdf", "curations": [
            {"curator": "ana", "description": "fixed row 3", "timestamp": "2031-01-02T03:04:05"}
        ], "custom_tag": "x"},
        "uuid": "11111111-aaaa-bbbb-cccc-000000000002",
    },
    # unicode-heavy values, no metadata/uuid
    'birds_c': {
        "tables": [
            {"rows": [
                {"nombre científico": "Søren-æbleflue", "población estimada": "1,2 30",
                 "notas": "ver «tabla 2»… ‘ok’"},
            ], "page": 10},
        ],
        "citation": None,
    },
}


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, doc in DOCS.items():
        with open(f'{OUT}/{name}.input.json', 'w', encoding='utf-8') as f:
            json.dump(doc, f, ensure_ascii=False, indent=2)
        tf = TablesFile.model_validate(doc)
        compact = json.dumps(tf.model_dump(), ensure_ascii=False)
        with open(f'{OUT}/{name}.expected.json', 'w', encoding='utf-8') as f:
            f.write(compact)
    print('model goldens written to', OUT)


if __name__ == '__main__':
    main()
