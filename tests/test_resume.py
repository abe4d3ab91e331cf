"""Resume template post-parse assembly (extractlib/resume.py) vs
rag/app/resume.py:95-171."""

from ragflow_spark.extractlib.resume import chunk_resume


def _base():
    return {
        "name_kwd": "Name1",
        "gender_kwd": "男",
        "age_int": 24,
        "position_name_tks": "engineer level 3",
        "degree_kwd": ["本科", "硕士"],
        "work_exp_flt": 0.0,
    }


def test_content_lines_and_label_stripping():
    doc = chunk_resume(_base(), "r.pdf")
    lines = doc["content_with_weight"].split("\n")
    # parenthetical stripped from the gender label
    assert "性别: 男" in lines
    # falsy values (work_exp 0.0) skipped entirely
    assert not any("工作年限" in ln for ln in lines)
    # list values joined with spaces, label stripped
    assert "过往学历: 本科 硕士" in lines
    # field_map insertion order preserved
    assert lines[0] == "姓名/名字: Name1"


def test_title_assembly():
    doc = chunk_resume(_base(), "r.pdf")
    # '-'.join(name, gender, rmSpace(position), age) + '-简历',
    # tokenized; rmSpace keeps latin-internal spaces
    assert doc["docnm_kwd"] == "r.pdf"
    # 简历 is outside the embedded mini-dict -> per-char fallback
    # (vocab-limited, machinery-correct; SURVEY §2.7 note)
    assert "简 历" in doc["title_tks"]
    assert "name1" in doc["title_tks"]


def test_field_flattening_rules():
    r = _base()
    r["school_name_tks"] = ["tsinghua"]        # singleton -> flattened
    doc = chunk_resume(r, "r.pdf")
    # forbidden select field with >1 values STAYS a list
    assert doc["degree_kwd"] == ["本科", "硕士"]
    # singleton flattens even for _tks (then fine-grained tokenized)
    assert isinstance(doc["school_name_tks"], str)
    # forbidden singleton also flattens
    r2 = _base()
    r2["degree_kwd"] = ["本科"]
    assert chunk_resume(r2, "r.pdf")["degree_kwd"] == "本科"


def test_chunk_resume_list_valued_title_field():
    from ragflow_spark.extractlib.resume import chunk_resume
    doc = chunk_resume({"name_kwd": ["张三"], "gender_kwd": "男",
                        "position_name_tks": "工程 师",
                        "age_int": 30}, "r.pdf")
    assert "张三" in doc["title_tks"] or "张 三" in doc["title_tks"]
