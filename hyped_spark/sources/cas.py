"""UIMA CAS dataset reader (S3): .xmi / .json CAS files → one row per CAS.

Spark-native reimplementation of the reference's CasDataset
(reference src/hyped/data/io/datasets/cas.py:69-158, 183-317), which loads
UIMA XMI or UIMA-JSON files with the ``cassis`` library across a
multiprocessing pool. Here the pool is Spark: a ``binaryFile`` scan
parallelizes over files and a ``mapInPandas`` stage parses each CAS with
the stdlib — ``xml.etree`` for XMI (the XMI subset a CAS dump uses is
plain namespaced XML), ``json`` for the UIMA JSON CAS format
(``%FEATURE_STRUCTURES`` / ``%ID`` / ``%TYPE`` / ``@ref`` keys). Format is
chosen per file by extension, exactly like the reference worker
(cas.py:95-96).

Output schema mirrors the reference's feature dict exactly:

- ``sofa``             — the document text (``cas:Sofa/@sofaString``);
- ``meta``             — struct with the source ``file_path``;
- ``"<Type>:<feat>"``  — one ARRAY column per requested annotation type ×
  feature, aligned by annotation order; features whose range is another
  requested annotation type hold the INDEX of the target annotation in
  that type's array (cas.py:146-157's xmiID→index conversion).

Annotation order is the UIMA annotation-index order (begin asc, end desc,
xmi:id asc). Files that fail to parse are dropped with a warning row count,
matching the reference worker's log-and-skip (cas.py:98-103).

The typesystem is the standard UIMA ``TypeSystemDescription`` XML
(name / features / rangeTypeName); requesting a type absent from it raises
``TypeError`` like the reference (cas.py:45-50).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_TS_NS = "{http://uima.apache.org/resourceSpecifier}"

# uima.cas primitive range type → Spark type (reference cas.py:17-26)
_PRIMITIVE_TYPE_MAP: dict[str, T.DataType] = {
    "uima.cas.Boolean": T.BooleanType(),
    "uima.cas.Byte": T.BinaryType(),
    "uima.cas.Short": T.ShortType(),
    "uima.cas.Integer": T.IntegerType(),
    "uima.cas.Long": T.LongType(),
    "uima.cas.Float": T.FloatType(),
    "uima.cas.Double": T.DoubleType(),
    "uima.cas.String": T.StringType(),
}

_PY_CAST = {
    "uima.cas.Boolean": lambda s: s == "true",
    "uima.cas.Byte": lambda s: s.encode(),
    "uima.cas.Short": int,
    "uima.cas.Integer": int,
    "uima.cas.Long": int,
    "uima.cas.Float": float,
    "uima.cas.Double": float,
    "uima.cas.String": str,
}


@dataclass
class TypeSystem:
    """Parsed subset of a UIMA TypeSystemDescription."""

    # type name -> [(feature name, range type name)]
    types: dict[str, list[tuple[str, str]]] = field(default_factory=dict)

    def select(self, type_names: list[str] | None) -> list[str]:
        if type_names is None:
            return sorted(self.types)
        for name in type_names:
            if name not in self.types:
                raise TypeError(
                    f"Annotation Type `{name}` not found in typesystem"
                )
        return list(type_names)


def load_typesystem(path: str) -> TypeSystem:
    """Parse a TypeSystemDescription XML file."""
    root = ET.parse(path).getroot()
    ts = TypeSystem()
    for td in root.iter(f"{_TS_NS}typeDescription"):
        name = td.findtext(f"{_TS_NS}name")
        feats: list[tuple[str, str]] = [
            ("begin", "uima.cas.Integer"),
            ("end", "uima.cas.Integer"),
        ]
        for fd in td.iter(f"{_TS_NS}featureDescription"):
            feats.append((
                fd.findtext(f"{_TS_NS}name"),
                fd.findtext(f"{_TS_NS}rangeTypeName"),
            ))
        ts.types[name] = feats
    return ts


def cas_schema(ts: TypeSystem, annotation_types: list[str] | None) -> T.StructType:
    """The static Spark schema for a set of requested annotation types —
    the reference computes the same mapping dynamically into HF Features
    (cas.py:197-258)."""
    requested = ts.select(annotation_types)
    fields = [
        T.StructField("sofa", T.StringType()),
        T.StructField("meta", T.StructType(
            [T.StructField("file_path", T.StringType())]
        )),
    ]
    for tname in requested:
        for fname, rng in ts.types[tname]:
            if rng in _PRIMITIVE_TYPE_MAP:
                elem = _PRIMITIVE_TYPE_MAP[rng]
            elif rng in requested:
                elem = T.IntegerType()  # xmiID → index of target annotation
            else:
                continue
            fields.append(
                T.StructField(f"{tname}:{fname}", T.ArrayType(elem))
            )
    return T.StructType(fields)


def _elem_type_name(tag: str) -> str:
    """``{http:///com/example.ecore}Token`` → ``com.example.Token``
    (the cassis/UIMA namespace convention)."""
    if not tag.startswith("{"):
        return tag
    uri, local = tag[1:].split("}", 1)
    pkg = uri
    for prefix in ("http:///", "http://"):
        if pkg.startswith(prefix):
            pkg = pkg[len(prefix):]
            break
    if pkg.endswith(".ecore"):
        pkg = pkg[: -len(".ecore")]
    pkg = pkg.strip("/").replace("/", ".")
    return f"{pkg}.{local}" if pkg else local


def _extract_xmi(content: bytes, requested: list[str]):
    """(sofa, by_type string-attr dicts) from an .xmi CAS, or None."""
    try:
        root = ET.fromstring(content)
    except ET.ParseError:
        return None
    sofa = None
    by_type: dict[str, list[dict]] = {t: [] for t in requested}
    for el in root:
        tname = _elem_type_name(el.tag)
        if tname == "uima.cas.Sofa":
            sofa = el.get("sofaString")
        elif tname in by_type:
            by_type[tname].append(dict(el.attrib))
    return sofa, by_type


def _extract_json(content: bytes, requested: list[str]):
    """(sofa, by_type) from a UIMA JSON CAS (the cassis
    ``load_cas_from_json`` format the reference also accepts,
    reference src/hyped/data/io/datasets/cas.py:95-96): feature
    structures under ``%FEATURE_STRUCTURES`` with ``%ID``/``%TYPE`` keys
    and ``@feat`` for references. Values are normalized to the same
    string-attr convention as the XMI path so both formats share one
    downstream pipeline (sort, xmiID→index, casting)."""
    import json as _json

    try:
        doc = _json.loads(content)
    except (ValueError, UnicodeDecodeError):
        return None
    fss = doc.get("%FEATURE_STRUCTURES")
    if not isinstance(fss, list):
        return None
    sofa = None
    by_type: dict[str, list[dict]] = {t: [] for t in requested}
    for fs in fss:
        if not isinstance(fs, dict):
            continue
        tname = fs.get("%TYPE")
        if tname == "uima.cas.Sofa":
            sofa = fs.get("sofaString")
            continue
        if tname not in by_type:
            continue
        attrs: dict[str, str] = {}
        for k, v in fs.items():
            if k == "%ID":
                attrs["xmi:id"] = str(v)
            elif k.startswith("@"):  # FS reference → target %ID
                attrs[k[1:]] = str(v)
            elif not k.startswith("%"):
                if isinstance(v, bool):
                    attrs[k] = "true" if v else "false"
                elif v is not None:
                    attrs[k] = str(v)
        by_type[tname].append(attrs)
    return sofa, by_type


def _parse_cas(content: bytes, fpath: str, ts: TypeSystem,
               requested: list[str]) -> dict | None:
    extract = _extract_json if fpath.endswith(".json") else _extract_xmi
    parsed = extract(content, requested)
    if parsed is None:
        return None
    sofa, by_type = parsed

    def sort_key(a: dict):
        # UIMA annotation index order: begin asc, end desc, id asc
        return (int(a.get("begin", 0)), -int(a.get("end", 0)),
                int(a.get(_xmi_id_key(a), 0)))

    for anns in by_type.values():
        anns.sort(key=sort_key)
    # xmiID → position per type (reference cas.py:110-117, 146-157)
    index_of = {
        tname: {a[_xmi_id_key(a)]: i for i, a in enumerate(anns)
                if _xmi_id_key(a) in a}
        for tname, anns in by_type.items()
    }

    out: dict = {"sofa": sofa, "meta": {"file_path": fpath}}
    for tname in requested:
        for fname, rng in ts.types[tname]:
            if rng in _PY_CAST:
                cast = _PY_CAST[rng]
                col = [
                    cast(a[fname]) if fname in a else None
                    for a in by_type[tname]
                ]
            elif rng in requested:
                col = [
                    index_of[rng].get(a.get(fname))
                    for a in by_type[tname]
                ]
            else:
                continue
            out[f"{tname}:{fname}"] = col
    return out


def _xmi_id_key(attrs: dict) -> str:
    for k in attrs:
        if k.endswith("}id") or k == "xmi:id":
            return k
    return "__missing__"


def read_cas_dataset(
    spark: SparkSession,
    path: str,
    typesystem: str,
    annotation_types: list[str] | None = None,
) -> DataFrame:
    """Read a directory of ``.xmi`` / ``.json`` CAS files into a DataFrame
    (one row per CAS; format chosen per file by extension, like the
    reference worker — reference src/hyped/data/io/datasets/cas.py:95-96).
    ``typesystem`` is a TypeSystemDescription XML path; unparseable files
    are skipped (the reference worker's behavior)."""
    ts = load_typesystem(typesystem)
    requested = ts.select(annotation_types)
    schema = cas_schema(ts, annotation_types)
    cols = [f.name for f in schema.fields]

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{xmi,json}")
        .load(path)
        .select("path", "content")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover (executor)
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                d = _parse_cas(bytes(content), fpath, ts, requested)
                if d is not None:
                    rows.append([d.get(c) for c in cols])
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, schema=schema)
