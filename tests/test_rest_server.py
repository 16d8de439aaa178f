"""GSvarServer analogue + VersatileFile + queueing controllers + Settings.

Mirrors the reference's live-server test style (GSvarServer-TEST runs against
a started server instance).
"""

import json
import os
import urllib.error
import urllib.request

import pytest

from ngsbits_tpu.io.versatile import VersatileFile, is_remote
from ngsbits_tpu.rest.queueing import (QueuingEngineControllerGeneric,
                                       QueuingEngineControllerSge,
                                       QueuingEngineControllerSlurm)
from ngsbits_tpu.rest.server import GSvarServer
from ngsbits_tpu.core import settings


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("server_root")
    (root / "hello.txt").write_bytes(b"0123456789abcdef")
    srv = GSvarServer(str(root), users={"ahtest": "secret"})
    srv.start()
    yield srv
    srv.stop()


def _get(srv, path, headers=None, method="GET"):
    req = urllib.request.Request(f"http://127.0.0.1:{srv.port}{path}",
                                 headers=headers or {}, method=method)
    return urllib.request.urlopen(req, timeout=10)


def _post(srv, path, data: dict):
    body = urllib.parse.urlencode(data).encode()
    req = urllib.request.Request(f"http://127.0.0.1:{srv.port}{path}", data=body)
    return urllib.request.urlopen(req, timeout=10)


import urllib.parse  # noqa: E402


def _login(srv) -> str:
    with _post(srv, "/login", {"name": "ahtest", "password": "secret"}) as resp:
        return resp.read().decode()


def test_index_info_help(server):
    with _get(server, "/") as resp:
        assert resp.status == 200
        assert b"GSvar server" in resp.read()
    with _get(server, "/info") as resp:
        info = json.loads(resp.read())
        assert info["name"] == "GSvar server"
        assert "api_version" in info
    with _get(server, "/help") as resp:
        text = resp.read().decode()
        assert "POST /login" in text and "GET /static" in text


def test_login_session_logout(server):
    # bad credentials -> 401
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server, "/login", {"name": "ahtest", "password": "wrong"})
    assert err.value.code == 401

    token = _login(server)
    assert len(token) == 40

    with _get(server, f"/session?token={token}") as resp:
        info = json.loads(resp.read())
        assert info["valid_period"] == 3600
        assert not info["is_db_token"]

    with _post(server, "/logout", {"token": token}) as resp:
        assert b"logged out" in resp.read()
    # token is now invalid
    with pytest.raises(urllib.error.HTTPError) as err:
        _get(server, f"/session?token={token}")
    assert err.value.code == 401


def test_static_requires_auth_and_serves_ranges(server):
    with pytest.raises(urllib.error.HTTPError) as err:
        _get(server, "/static/hello.txt")
    assert err.value.code == 401

    token = _login(server)
    with _get(server, f"/static/hello.txt?token={token}") as resp:
        assert resp.read() == b"0123456789abcdef"

    # byte range
    with _get(server, f"/static/hello.txt?token={token}",
              headers={"Range": "bytes=4-7"}) as resp:
        assert resp.status == 206
        assert resp.read() == b"4567"
        assert resp.headers["Content-Range"] == "bytes 4-7/16"

    # HEAD reports size without body
    with _get(server, f"/static/hello.txt?token={token}", method="HEAD") as resp:
        assert resp.headers["Content-Length"] == "16"

    # path traversal denied
    with pytest.raises(urllib.error.HTTPError) as err:
        _get(server, f"/static/../secret?token={token}")
    assert err.value.code in (403, 404)

    # 404 for missing files, 405 for wrong method
    with pytest.raises(urllib.error.HTTPError) as err:
        _get(server, f"/static/nope.txt?token={token}")
    assert err.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as err:
        _get(server, "/login")
    assert err.value.code == 405


def test_temp_urls_and_upload(server, tmp_path):
    token = _login(server)
    payload = b"uploaded-content"
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/upload?token={token}&filename=up.bin",
        data=payload, headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=10) as resp:
        assert b"uploaded" in resp.read()
    assert (open(os.path.join(server.server_root, "up.bin"), "rb").read()
            == payload)

    # temp URL streaming
    src = tmp_path / "temp_file.txt"
    src.write_bytes(b"temp-data")
    entity = server.urls.add_file(str(src))
    with _get(server, f"/temp/{entity.string_id}") as resp:
        assert resp.read() == b"temp-data"
    # unknown id -> 404
    with pytest.raises(urllib.error.HTTPError) as err:
        _get(server, "/temp/doesnotexist")
    assert err.value.code == 404


def test_versatile_file_local_and_remote(server, tmp_path):
    # local
    local = tmp_path / "local.bin"
    local.write_bytes(b"ABCDEFGH")
    with VersatileFile(str(local)) as fh:
        assert fh.exists() and fh.size() == 8
        fh.seek(2)
        assert fh.read(3) == b"CDE"

    # remote over our own server (range-capable)
    token = _login(server)
    url = f"http://127.0.0.1:{server.port}/static/hello.txt?token={token}"
    assert is_remote(url)
    vf = VersatileFile(url)
    assert vf.exists()
    assert vf.size() == 16
    vf.seek(10)
    assert vf.read(4) == b"abcd"
    vf.seek(0)
    assert vf.read(-1) == b"0123456789abcdef"
    missing = VersatileFile(f"http://127.0.0.1:{server.port}/static/no.txt?token={token}")
    assert not missing.exists()


def test_queueing_controllers(tmp_path):
    sge = QueuingEngineControllerSge(data_folder=str(tmp_path),
                                     pipeline_root="/opt/megSAP")
    cmd = sge.submit_command(8, ["default_srv1"], ["-sys", "ssHAEv7"],
                             "/work/dir", "analyze.php", 17)
    assert cmd[:1] == ["qsub"]
    assert "-pe" in cmd and cmd[cmd.index("-pe") + 2] == "8"
    assert "-q" in cmd and cmd[cmd.index("-q") + 1] == "default_srv1"
    assert cmd[-4:] == ["php", "/opt/megSAP/src/Pipelines/analyze.php",
                        "-sys", "ssHAEv7"]
    assert sge.parse_job_id('Your job 17 ("php") has been submitted') == "17"
    # dragen pins smp to 1 (QueuingEngineControllerSge.cpp:21)
    cmd = sge.submit_command(8, ["q"], [], "/w", "analyze_dragen.php", 1)
    assert cmd[cmd.index("-pe") + 2] == "1"

    slurm = QueuingEngineControllerSlurm(data_folder=str(tmp_path),
                                         pipeline_root="/opt/megSAP")
    os.makedirs(tmp_path / "analysis_jobs_logs", exist_ok=True)
    wrapper = slurm.write_wrapper_script(["-sys", "x"], "analyze.php", 3)
    assert open(wrapper).read().startswith("#!/bin/sh\nphp /opt/megSAP")
    cmd = slurm.submit_command(4, ["", "queue1"], ["-sys", "x"], "/w",
                               "analyze.php", 3)
    assert cmd[0] == "sbatch" and "--cpus-per-task=4" in cmd
    assert "-p" in cmd and cmd[cmd.index("-p") + 1] == "queue1"
    assert slurm.parse_job_id("Submitted batch job 42") == "42"

    # fake runner end-to-end
    sge_ok = QueuingEngineControllerSge(
        data_folder=str(tmp_path), pipeline_root="/r",
        runner=lambda cmd: (0, 'Your job 99 ("php") has been submitted'))
    res = sge_ok.submit_job(2, ["q"], [], "/w", "analyze.php", 5)
    assert res.ok and res.engine_job_id == "99"
    sge_fail = QueuingEngineControllerSge(
        data_folder=str(tmp_path), pipeline_root="/r",
        runner=lambda cmd: (1, "cannot contact qmaster"))
    res = sge_fail.submit_job(2, ["q"], [], "/w", "analyze.php", 5)
    assert not res.ok and "exit code 1" in res.details[0]

    gen = QueuingEngineControllerGeneric(
        ["mysubmit", "--cpus", "{threads}", "{script}"],
        data_folder=str(tmp_path), pipeline_root="/r")
    cmd = gen.submit_command(6, [], [], "/w", "s.php", 1)
    assert cmd == ["mysubmit", "--cpus", "6", "/r/src/Pipelines/s.php"]
    assert gen.parse_job_id("job 123 queued") == "123"


def test_settings_ini(tmp_path, monkeypatch):
    ini = tmp_path / "settings.ini"
    ini.write_text("# comment\nreference_genome = /data/hg38.fa\n"
                   "[server]\nserver_port=8443\nuse_ssl = true\n")
    monkeypatch.setenv("NGSBITS_SETTINGS", str(ini))
    settings.clear_cache()
    assert settings.contains("reference_genome")
    assert settings.string("reference_genome") == "/data/hg38.fa"
    assert settings.integer("server_port") == 8443
    assert settings.boolean("use_ssl")
    assert settings.string("missing", optional=True) == ""
    with pytest.raises(KeyError):
        settings.string("missing")
    # env var wins
    monkeypatch.setenv("NGSBITS_REFERENCE_GENOME", "/other.fa")
    assert settings.string("reference_genome") == "/other.fa"
    assert settings.reference_genome("hg38") == "/other.fa"
    settings.clear_cache()
