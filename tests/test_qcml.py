

def test_qcml_schema_validation(tmp_path):
    """Written qcML validates against the shipped qcML_0.0.8.xsd and a
    deliberately malformed file is rejected (QCCollection.cpp:339-366)."""
    from ngsbits_tpu.core.qcml import validate_qcml_schema

    # goldens on disk have <binary> lines stripped, so validate a freshly
    # written qcML instead
    from helpers import execute
    out = tmp_path / "o.qcML"
    assert execute("ReadQC", [
        "-in1", "/root/reference/src/tools-TEST/data_in/ReadQC_in1.fastq.gz",
        "-out", out]) == 0
    assert validate_qcml_schema(str(out)) == ""

    bad = tmp_path / "bad.qcML"
    bad.write_text('<?xml version="1.0"?>\n'
                   '<qcML version="0.0.8" xmlns="http://www.prime-xs.eu/ms/qcml">'
                   '<bogusElement/></qcML>\n')
    assert validate_qcml_schema(str(bad)) != ""

    notxml = tmp_path / "corrupt.qcML"
    notxml.write_text("this is not xml")
    assert validate_qcml_schema(str(notxml)) != ""
