"""table template: typing vote, conversion, row docs."""

from ragflow_spark.extractlib.tableparse import (chunk_table_txt,
                                                 column_data_type,
                                                 parse_table_txt,
                                                 table_row_docs,
                                                 trans_bool, trans_datetime)


def test_type_vote_and_conversion():
    assert column_data_type(["1", "2", "3"]) == ([1, 2, 3], "int")
    assert column_data_type(["1.5", "2.25"]) == ([1.5, 2.25], "float")
    # reference quirk: trailing .0+ still counts (and converts) as int...
    vals, ty = column_data_type(["3.0", "4.00"])
    assert ty == "int" and vals == [None, None]  # int('3.0') fails -> None
    assert column_data_type(["yes", "NO"]) == (["yes", "no"], "bool")
    vals, ty = column_data_type(["2024-01-02", "2024/01/03"])
    assert ty == "datetime"
    assert vals == ["2024-01-02 00:00:00", "2024-01-03 00:00:00"]
    assert column_data_type(["abc", "1"])[1] in ("int", "text")


def test_trans_helpers():
    assert trans_bool("TRUE") == "yes" and trans_bool("×") == "no"
    assert trans_bool("maybe") is None
    assert trans_datetime("2024-01-02 03:04") == "2024-01-02 03:04:00"
    assert trans_datetime("garbage") is None


def test_parse_drops_mismatched_rows():
    headers, rows = parse_table_txt("a\tb\n1\t2\nonly-one\n3\t4")
    assert headers == ["a", "b"]
    assert rows == [["1", "2"], ["3", "4"]]


def test_row_docs_fields_and_id_drop():
    docs = table_row_docs(["id", "name", "qty"],
                          [["7", "alpha", "3"], ["8", "beta", "4"]])
    assert [t for t, _ in docs] == ["name:alpha; qty:3",
                                    "name:beta; qty:4"]
    assert docs[0][1] == {"name_tks": "alpha", "qty_long": 3}


def test_chunk_table_hostile():
    assert chunk_table_txt(b"") == []
    assert chunk_table_txt(b"header-only") == []
    chunk_table_txt(bytes(range(256)))
