"""UIMA CAS reader: XMI parsing, annotation order, nested refs, skip-bad."""

from __future__ import annotations

import pytest

TYPESYSTEM = """<?xml version="1.0" encoding="UTF-8"?>
<typeSystemDescription xmlns="http://uima.apache.org/resourceSpecifier">
  <types>
    <typeDescription>
      <name>com.example.Token</name>
      <supertypeName>uima.tcas.Annotation</supertypeName>
      <features>
        <featureDescription>
          <name>pos</name>
          <rangeTypeName>uima.cas.String</rangeTypeName>
        </featureDescription>
      </features>
    </typeDescription>
    <typeDescription>
      <name>com.example.Entity</name>
      <supertypeName>uima.tcas.Annotation</supertypeName>
      <features>
        <featureDescription>
          <name>label</name>
          <rangeTypeName>uima.cas.String</rangeTypeName>
        </featureDescription>
        <featureDescription>
          <name>head</name>
          <rangeTypeName>com.example.Token</rangeTypeName>
        </featureDescription>
      </features>
    </typeDescription>
  </types>
</typeSystemDescription>
"""

XMI = """<?xml version="1.0" encoding="UTF-8"?>
<xmi:XMI xmlns:xmi="http://www.omg.org/XMI"
         xmlns:cas="http:///uima/cas.ecore"
         xmlns:example="http:///com/example.ecore" xmi:version="2.0">
  <cas:NULL xmi:id="0"/>
  <example:Token xmi:id="7" sofa="1" begin="6" end="11" pos="NN"/>
  <example:Token xmi:id="3" sofa="1" begin="0" end="5" pos="DT"/>
  <example:Entity xmi:id="9" sofa="1" begin="0" end="11" label="THING" head="7"/>
  <cas:Sofa xmi:id="1" sofaNum="1" sofaID="_InitialView"
            mimeType="text" sofaString="hello world"/>
</xmi:XMI>
"""


# the same CAS as XMI, in the UIMA JSON format cassis load_cas_from_json
# accepts (the reference reads both by extension, cas.py:95-96)
CAS_JSON = """{
  "%TYPES": [],
  "%FEATURE_STRUCTURES": [
    {"%ID": 1, "%TYPE": "uima.cas.Sofa", "sofaNum": 1,
     "sofaID": "_InitialView", "mimeType": "text",
     "sofaString": "hello json"},
    {"%ID": 7, "%TYPE": "com.example.Token", "@sofa": 1,
     "begin": 6, "end": 10, "pos": "NN"},
    {"%ID": 3, "%TYPE": "com.example.Token", "@sofa": 1,
     "begin": 0, "end": 5, "pos": "DT"},
    {"%ID": 9, "%TYPE": "com.example.Entity", "@sofa": 1,
     "begin": 0, "end": 10, "label": "THING", "@head": 7}
  ]
}"""


@pytest.fixture()
def cas_dir(tmp_path):
    (tmp_path / "ts.xml").write_text(TYPESYSTEM)
    d = tmp_path / "cas"
    d.mkdir()
    (d / "doc1.xmi").write_text(XMI)
    (d / "doc2.xmi").write_text(XMI.replace("hello world", "second doc"))
    (d / "broken.xmi").write_text("<xmi:XMI this is not xml")
    (d / "notes.txt").write_text("ignored — not .xmi")
    return tmp_path


def test_read_cas_dataset(spark, cas_dir):
    from hyped_spark.sources.cas import read_cas_dataset

    df = read_cas_dataset(
        spark, str(cas_dir / "cas"), str(cas_dir / "ts.xml"),
        ["com.example.Token", "com.example.Entity"],
    )
    rows = {r["meta"]["file_path"].split("/")[-1]: r for r in df.collect()}
    # the corrupt file is skipped (log-and-skip), the .txt never scanned
    assert set(rows) == {"doc1.xmi", "doc2.xmi"}

    r = rows["doc1.xmi"]
    assert r["sofa"] == "hello world"
    # annotation order: begin asc (document order, not xmi order)
    assert r["com.example.Token:begin"] == [0, 6]
    assert r["com.example.Token:end"] == [5, 11]
    assert r["com.example.Token:pos"] == ["DT", "NN"]
    assert r["com.example.Entity:label"] == ["THING"]
    # nested ref: Entity.head points at xmi:id=7 -> Token index 1
    assert r["com.example.Entity:head"] == [1]
    assert rows["doc2.xmi"]["sofa"] == "second doc"


def test_read_cas_dataset_json_variant(spark, cas_dir):
    """A mixed directory of .xmi and UIMA-JSON .json CAS files reads into
    ONE frame with identical annotation/ref-index semantics per format
    (reference cas.py:95-96 load_cas_from_json); corrupt JSON is skipped
    like corrupt XMI."""
    from hyped_spark.sources.cas import read_cas_dataset

    d = cas_dir / "cas"
    (d / "doc3.json").write_text(CAS_JSON)
    (d / "broken.json").write_text("{not json")
    df = read_cas_dataset(
        spark, str(d), str(cas_dir / "ts.xml"),
        ["com.example.Token", "com.example.Entity"],
    )
    rows = {r["meta"]["file_path"].split("/")[-1]: r for r in df.collect()}
    assert set(rows) == {"doc1.xmi", "doc2.xmi", "doc3.json"}

    r = rows["doc3.json"]
    assert r["sofa"] == "hello json"
    # annotation-index order (begin asc), typed features cast per typesystem
    assert r["com.example.Token:begin"] == [0, 6]
    assert r["com.example.Token:pos"] == ["DT", "NN"]
    # FS reference @head=7 -> Token with %ID 7 -> index 1
    assert r["com.example.Entity:head"] == [1]
    # and the XMI siblings are unchanged by the mixed scan
    assert rows["doc1.xmi"]["com.example.Entity:head"] == [1]


def test_cas_unknown_type_raises(spark, cas_dir):
    from hyped_spark.sources.cas import read_cas_dataset

    with pytest.raises(TypeError, match="not found in typesystem"):
        read_cas_dataset(
            spark, str(cas_dir / "cas"), str(cas_dir / "ts.xml"),
            ["com.example.Nope"],
        )


def test_cas_schema_static(spark, cas_dir):
    from hyped_spark.sources.cas import cas_schema, load_typesystem

    ts = load_typesystem(str(cas_dir / "ts.xml"))
    schema = cas_schema(ts, ["com.example.Token"])
    names = [f.name for f in schema.fields]
    assert names == [
        "sofa", "meta",
        "com.example.Token:begin", "com.example.Token:end",
        "com.example.Token:pos",
    ]
    # Entity.head (range = Token) only materializes when Token is requested
    both = cas_schema(ts, ["com.example.Token", "com.example.Entity"])
    assert "com.example.Entity:head" in [f.name for f in both.fields]
