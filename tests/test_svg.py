"""SVG writer parity with geozero/src/svg/writer.rs tests."""

from geozero_spark.kernel import svg, wkt
from geozero_spark.kernel.model import point


def test_point_not_inverted():
    # writer.rs test :221-223 coordinate
    g = point(2223639.4731508396, -15878634.348995442)
    assert svg.encode(g, invert_y=False) == \
        '<path d="M 2223639.4731508396 -15878634.348995442 Z"/>'


def test_tagged_linestring_has_no_m_or_z():
    # writer.rs test :197-199: bare coords inside the path
    g = wkt.decode("LINESTRING(1 2,3 4)")
    assert svg.encode(g, invert_y=False) == '<path d="1 2 3 4 "/>'


def test_polygon_rings_are_m_z_runs_inverted():
    g = wkt.decode(
        "POLYGON((0 0,4 0,4 4,0 0),(1 1,2 1,1 2,1 1))")
    assert svg.encode(g, invert_y=True) == (
        '<path d="M 0 -0 4 -0 4 -4 0 -0 Z '
        'M 1 -1 2 -1 1 -2 1 -1 Z "/>')


def test_multipolygon_one_path_per_polygon():
    g = wkt.decode("MULTIPOLYGON(((0 0,1 0,0 1,0 0)),((5 5,6 5,5 6,5 5)))")
    out = svg.encode(g, invert_y=False)
    assert out.count("<path") == 2
    assert out == ('<path d="M 0 0 1 0 0 1 0 0 Z "/>'
                   '<path d="M 5 5 6 5 5 6 5 5 Z "/>')


def test_multilinestring_single_path_with_z_runs():
    g = wkt.decode("MULTILINESTRING((0 0,1 1),(2 2,3 3))")
    assert svg.encode(g, invert_y=False) == \
        '<path d="M 0 0 1 1 Z M 2 2 3 3 Z "/>'


def test_zaf_polygon_fragment_matches_reference():
    # first coords of the reference's ZAF test (writer.rs:150-167)
    g = wkt.decode("POLYGON((31.521001 -29.257387,31.325561 -29.401978,"
                   "31.521001 -29.257387))")
    out = svg.encode(g, invert_y=True)
    assert out.startswith('<path d="M 31.521001 29.257387 '
                          '31.325561 29.401978 ')
    assert out.endswith('Z "/>')


def test_document_framing():
    doc = svg.document(['<path d="M 1 2 Z"/>'], name="pts",
                       bounds=(0.0, 0.0, 10.0, 10.0), invert_y=True,
                       width=100, height=100)
    assert doc.startswith('<?xml version="1.0"?>\n<svg ')
    assert 'viewBox="0.0 -10.0 10.0 10.0" ' in doc
    assert doc.endswith('\n</g>\n</svg>')
    assert '<g id="pts">\n<path' in doc
