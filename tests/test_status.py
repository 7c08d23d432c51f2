from bitar_tpu.status import Result, Status, StatusCode, StatusError


def test_ok():
    s = Status.OK()
    assert s.ok()
    assert s.to_int() == 0
    s.raise_if_error()


def test_error_codes_roundtrip_int():
    for code in StatusCode:
        if code == StatusCode.OK:
            continue
        s = Status(code, "boom")
        assert not s.ok()
        assert s.to_int() == -int(code)
        back = Status.from_int(s.to_int(), "boom")
        assert back.code == code


def test_from_int_unknown():
    assert Status.from_int(-999).code == StatusCode.UNKNOWN_ERROR
    assert Status.from_int(5).ok()


def test_raise_and_context():
    s = Status.Invalid("bad knob").with_context("Initialize")
    assert "Initialize: bad knob" in str(s)
    try:
        s.raise_if_error()
        raise AssertionError("should have raised")
    except StatusError as e:
        assert e.status.code == StatusCode.INVALID


def test_result():
    r = Result.ok(41)
    assert r.is_ok() and r.value() == 41
    assert r.map(lambda v: v + 1).value() == 42
    bad = Result.error(Status.IOError("disk"))
    assert not bad.is_ok()
    assert bad.map(lambda v: v + 1) is bad
    try:
        bad.value()
        raise AssertionError("should have raised")
    except StatusError:
        pass
