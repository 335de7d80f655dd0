"""Tests for settings persistence, message console, device report."""

import os

from octproz_tpu.utils import MessageConsole, SettingsManager, device_report
from octproz_tpu.utils.console import Message


def test_settings_group_roundtrip(tmp_path):
    path = str(tmp_path / "settings.ini")
    s = SettingsManager(path)
    s.set_group("virtual-oct-system", {"file": "/data/x.raw", "bit_depth": 12,
                                       "sync": True, "wait_us": 1.5})
    s.save()

    s2 = SettingsManager(path)
    g = s2.get_group("virtual-oct-system")
    assert g["file"] == "/data/x.raw"
    assert s2.get_int("virtual-oct-system", "bit_depth") == 12
    assert s2.get_bool("virtual-oct-system", "sync") is True
    assert s2.get_float("virtual-oct-system", "wait_us") == 1.5
    assert s2.get("nope", "nope", "dflt") == "dflt"
    # timestamp written on save (settingsfilemanager timestamping)
    assert s2.get("main", "timestamp") is not None


def test_settings_backup_and_copy(tmp_path):
    path = str(tmp_path / "settings.ini")
    s = SettingsManager(path)
    s.set_group("g", {"a": 1})
    s.save()
    s.set_group("g", {"a": 2})
    s.save()
    assert os.path.exists(path + ".backup")
    meta = s.copy_to(str(tmp_path / "rec" / "meta.ini"))
    assert os.path.exists(meta)
    assert SettingsManager(meta).get_int("g", "a") == 2


def test_settings_percent_values_roundtrip(tmp_path):
    # QSettings has no interpolation; '%' in values must survive
    s = SettingsManager(str(tmp_path / "s.ini"))
    s.set_group("g", {"fmt": "100%", "path": r"C:\data\x%20y.raw"})
    s.save()
    s2 = SettingsManager(str(tmp_path / "s.ini"))
    assert s2.get("g", "fmt") == "100%"
    assert s2.get("g", "path") == r"C:\data\x%20y.raw"


def test_set_group_replaces_whole_group(tmp_path):
    s = SettingsManager(str(tmp_path / "s.ini"))
    s.set_group("g", {"old_key": 1})
    s.set_group("g", {"new_key": 2})
    assert "old_key" not in s.get_group("g")


def test_console_subscribers_and_dump():
    c = MessageConsole(max_messages=3)
    seen = []
    c.subscribe(seen.append)
    c.info("hello")
    c.error("boom")
    assert len(seen) == 2
    assert isinstance(seen[0], Message)
    assert "ERROR: boom" in c.dump()
    for i in range(5):
        c.info(f"m{i}")
    assert len(c.messages) == 3  # bounded


def test_device_report_runs():
    rep = device_report()
    assert len(rep) >= 1
    assert {"id", "platform", "device_kind"} <= set(rep[0])
