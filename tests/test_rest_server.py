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


# ---- round-3 endpoints (GSvarServer/main.cpp:38-90 full surface) ----

def _make_gsvar_folder(tmp_path, ps="NA99999_01"):
    folder = tmp_path / f"Sample_{ps}"
    folder.mkdir()
    gsvar = folder / f"{ps}.GSvar"
    gsvar.write_text(
        "##ANALYSISTYPE=GERMLINE_SINGLESAMPLE\n"
        f"##SAMPLE=<ID={ps},Gender=female,DiseaseStatus=affected>\n"
        f"#chr\tstart\tend\tref\tobs\t{ps}\tfilter\n"
        "chr1\t100\t100\tA\tC\thet\t\n")
    (folder / f"{ps}.bam").write_bytes(b"BAMDATA")
    (folder / f"{ps}_cnvs_clincnv.tsv").write_text("cnvs\n")
    return gsvar


def test_file_location_endpoint(server, tmp_path):
    token = _login(server)
    gsvar = _make_gsvar_folder(tmp_path)
    entity = server.urls.add_file(str(gsvar))
    with _get(server, f"/file_location?ps_url_id={entity.string_id}"
                      f"&type=BAM&token={token}") as resp:
        locs = json.loads(resp.read())
    assert len(locs) == 1
    assert locs[0]["id"] == "NA99999_01"
    assert locs[0]["exists"] is True
    assert locs[0]["filename"].startswith("temp/")
    # the temp URL must actually stream the file
    with _get(server, "/" + locs[0]["filename"]) as resp:
        assert resp.read() == b"BAMDATA"
    # CNV calls exist, VCF does not (but is still returned with exists=False)
    with _get(server, f"/file_location?ps_url_id={entity.string_id}"
                      f"&type=COPY_NUMBER_CALLS&token={token}") as resp:
        assert json.loads(resp.read())[0]["exists"] is True
    with _get(server, f"/file_location?ps_url_id={entity.string_id}"
                      f"&type=VCF&token={token}") as resp:
        assert json.loads(resp.read())[0]["exists"] is False


def test_project_file_put(server, tmp_path):
    token = _login(server)
    gsvar = _make_gsvar_folder(tmp_path, ps="NA99998_01")
    entity = server.urls.add_file(str(gsvar))
    changes = json.dumps([{"variant": "chr1:100-100 a>c",
                           "column": "filter", "text": "artefact"}]).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/project_file"
        f"?ps_url_id={entity.string_id}&token={token}",
        data=changes, method="PUT")
    with urllib.request.urlopen(req, timeout=10) as resp:
        assert resp.read() == b"Project file has been changed"
    assert "artefact" in gsvar.read_text()
    # idempotent second apply: no changes detected for a bogus variant
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/project_file"
        f"?ps_url_id={entity.string_id}&token={token}",
        data=json.dumps([{"variant": "chr9:1-1 t>g", "column": "filter",
                          "text": "x"}]).encode(), method="PUT")
    with urllib.request.urlopen(req, timeout=10) as resp:
        assert resp.read() == b"No changes to the file detected"


def test_db_token_and_secret_and_credentials(server):
    token = _login(server)
    with _post(server, "/db_token", {"token": token}) as resp:
        db_token = resp.read().decode()
    assert db_token and db_token != token
    # secret of the user session
    with _get(server, f"/secret?token={token}") as resp:
        secret = resp.read().decode()
    assert len(secret) == 128
    # ngsd credentials require the db token (user token must be rejected)
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server, "/ngsd_credentials", {"dbtoken": token})
    assert err.value.code == 401
    with _post(server, "/ngsd_credentials", {"dbtoken": db_token}) as resp:
        cred = json.loads(resp.read())
    assert set(cred) == {"ngsd_host", "ngsd_port", "ngsd_name",
                         "ngsd_user", "ngsd_pass"}
    with _post(server, "/genlab_credentials", {"dbtoken": db_token}) as resp:
        cred = json.loads(resp.read())
    assert "genlab_mssql" in cred


def test_current_client_and_notification(server):
    with _get(server, "/current_client") as resp:
        info = json.loads(resp.read())
    assert "version" in info and "date" in info
    with _get(server, "/notification") as resp:
        info = json.loads(resp.read())
    assert "id" in info and "message" in info


def test_coverage_endpoints(server, tmp_path):
    token = _login(server)
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import synth_bam
    bam = tmp_path / "cov.bam"
    synth_bam(str(bam), n_reads=5_000)
    entity = server.urls.add_file(str(bam))
    roi = "chr1\t1000000\t1050000\nchr1\t2000000\t2050000\n"
    with _post(server, "/low_coverage_regions",
               {"roi": roi, "bam_url_id": entity.string_id,
                "cutoff": "1", "token": token}) as resp:
        low = resp.read().decode()
    assert "chr1" in low  # 5k reads over 248Mb leave plenty below cutoff
    with _post(server, "/avg_coverage_gaps",
               {"roi": roi, "bam_url_id": entity.string_id,
                "token": token}) as resp:
        lines = resp.read().decode().strip().splitlines()
    assert len(lines) == 2 and all(len(l.split("\t")) == 4 for l in lines)
    # missing BAM -> 404
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(server, "/low_coverage_regions",
              {"roi": roi, "bam_url_id": "nonexistent", "cutoff": "1",
               "token": token})
    assert err.value.code == 404


def test_multi_sample_analysis_info(server, tmp_path):
    token = _login(server)
    gsvar = _make_gsvar_folder(tmp_path, ps="NA99997_01")
    entity = server.urls.add_file(str(gsvar))
    analyses = json.dumps([f"temp/{entity.string_id}/{entity.filename}"])
    with _post(server, "/multi_sample_analysis_info",
               {"analyses": analyses, "token": token}) as resp:
        info = json.loads(resp.read())
    assert info[0]["ps_sample_name_list"] == ["NA99997_01"]
    assert info[0]["analysis_name"] == "NA99997_01"


def test_gated_pipeline_endpoints(server):
    token = _login(server)
    with pytest.raises(urllib.error.HTTPError) as err:
        _get(server, f"/blat_search?sequence=ACGT&token={token}")
    assert err.value.code == 501


def test_endpoint_surface_complete(server):
    """Every endpoint name from the reference registry
    (GSvarServer/main.cpp:38-) must be registered (assets excluded: test-
    only Qt resource serving)."""
    reference_names = {
        "", "favicon.ico", "info", "assets", "static", "genome", "temp", "help",
        "file_location", "processed_sample_path", "project_folder",
        "project_folder_settings", "analysis_job_gsvar_file",
        "analysis_job_last_update", "analysis_job_log", "project_file",
        "ps_regions", "ps_genes", "secondary_analyses", "rna_fusion_pics",
        "rna_expression_plots", "current_client", "notification",
        "low_coverage_regions", "avg_coverage_gaps",
        "target_region_read_depth", "multi_sample_analysis_info", "upload",
        "clear_cache", "variant_annotation", "blat_search", "login",
        "session", "validate_credentials", "db_token", "secret",
        "ngsd_credentials", "genlab_credentials", "logout",
    }
    ours = {ep.url for ep in server.endpoints.endpoints()}
    missing = reference_names - ours
    assert not missing, f"missing endpoints: {sorted(missing)}"


@pytest.fixture
def ngsd_server(tmp_path, monkeypatch):
    """Server instance backed by a SQLite NGSD with one analysis job."""
    monkeypatch.setenv("NGSBITS_NGSD_TEST", str(tmp_path / "ngsd.sqlite"))
    from ngsbits_tpu.ngsd import NGSD
    db = NGSD(test_db=True)
    db.init()
    project_dir = tmp_path / "projects"
    project_dir.mkdir()
    cur = db.conn.cursor()
    cur.execute("INSERT INTO device (type, name) VALUES ('MiSeq', 'test')")
    cur.execute("INSERT INTO sender (name) VALUES ('sender1')")
    cur.execute(
        "INSERT INTO project (name, type, internal_coordinator_id, analysis) "
        "VALUES ('TestProj', 'research', 1, 'variants')")
    cur.execute(
        "INSERT INTO processing_system (name_short, name_manufacturer, shotgun,"
        " genome_id, type, target_file) VALUES ('ssHAEv6', 'SureSelect', 1, 1,"
        " 'WES', 'ssHAEv6.bed')")
    cur.execute("INSERT INTO sequencing_run (name, fcid, device_id, recipe, "
                "status) VALUES ('run1', 'FC1', 1, '151+8+151', "
                "'analysis_finished')")
    cur.execute("INSERT INTO sample (name, sample_type, species_id, gender, "
                "tumor, ffpe, sender_id) VALUES ('NA12345', 'DNA', 1, "
                "'female', 0, 0, 1)")
    cur.execute("INSERT INTO processed_sample (sample_id, process_id, "
                "sequencing_run_id, lane, processing_system_id, project_id) "
                "VALUES (1, 1, 1, '1', 1, 1)")
    cur.execute("INSERT INTO analysis_job (type, high_priority, args) "
                "VALUES ('single sample', 0, '')")
    cur.execute("INSERT INTO analysis_job_sample (analysis_job_id, "
                "processed_sample_id, info) VALUES (1, 1, '')")
    cur.execute("INSERT INTO user (user_id, password, user_role, name, email)"
                " VALUES ('ahtest', '', 'user', 'Test User', 't@t.de')")
    cur.execute("INSERT INTO user (user_id, password, user_role, name, email)"
                " VALUES ('ahadmin', '', 'admin', 'Test Admin', 'a@t.de')")
    db.conn.commit()
    db.set_password(db.get_value("SELECT id FROM user WHERE user_id='ahtest'"), "secret")
    db.set_password(db.get_value("SELECT id FROM user WHERE user_id='ahadmin'"), "secret")
    monkeypatch.setenv("NGSBITS_PROJECTS_FOLDER", str(project_dir) + "/")
    sample_folder = project_dir / "research" / "TestProj" / "Sample_NA12345_01"
    sample_folder.mkdir(parents=True)
    (sample_folder / "job.log").write_text("analysis done\n")

    root = tmp_path / "root"
    root.mkdir()
    srv = GSvarServer(str(root), users={"ahtest": "secret"}, ngsd=db)
    srv.start()
    yield srv, db, sample_folder
    srv.stop()
    db.close()


def test_analysis_job_endpoints(ngsd_server):
    srv, db, sample_folder = ngsd_server
    token = _login(srv)
    with _get(srv, f"/analysis_job_gsvar_file?job_id=1&token={token}") as resp:
        loc = json.loads(resp.read())
    assert loc["id"] == "NA12345_01"
    assert loc["type"] == "GSVAR"
    assert loc["exists"] is False  # GSvar not written yet
    with _get(srv, f"/analysis_job_last_update?job_id=1&token={token}") as resp:
        info = json.loads(resp.read())
    assert info["latest_file"] == "job.log"
    with _get(srv, f"/analysis_job_log?job_id=1&token={token}") as resp:
        log = json.loads(resp.read())
    assert log["exists"] is True
    # the log temp URL streams the content
    with _get(srv, "/" + log["filename"]) as resp:
        assert b"analysis done" in resp.read()


def test_project_folder_settings_requires_admin(ngsd_server):
    srv, db, _folder = ngsd_server
    token = _login(srv)
    # ahtest has role 'user' -> 401
    with pytest.raises(urllib.error.HTTPError) as err:
        _get(srv, f"/project_folder_settings?token={token}")
    assert err.value.code == 401
    # admin sees the project-type folder settings
    with _post(srv, "/login", {"name": "ahadmin", "password": "secret"}) as resp:
        admin_token = resp.read().decode()
    with _get(srv, f"/project_folder_settings?token={admin_token}") as resp:
        entries = json.loads(resp.read())
    assert {e["type"] for e in entries} >= {"research", "diagnostic"}
    with _get(srv, f"/project_folder?id=1&token={admin_token}") as resp:
        info = json.loads(resp.read())
    assert info["project_id"] == 1
    assert info["safe_to_change"] is False  # sample folder contains job.log


# ---------------------------------------------------------------- TLS + auth


@pytest.fixture(scope="module")
def tls_server(tmp_path_factory):
    """HTTPS server with a self-signed certificate (the reference
    GSvarServer is TLS-only: cppREST/SslServer.cpp + ssl_certificate/
    ssl_key settings written by .github/workflows/settings.sh)."""
    import ssl
    import subprocess

    root = tmp_path_factory.mktemp("tls_root")
    (root / "hello.txt").write_bytes(b"tls-content")
    cert = root / "cert.pem"
    key = root / "key.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "1",
         "-subj", "/CN=localhost"],
        check=True, capture_output=True)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(str(cert), str(key))
    srv = GSvarServer(str(root), users={"ahtest": "secret"}, ssl_context=ctx)
    srv.start()
    yield srv, str(cert)
    srv.stop()


def _tls_request(srv, cert, path, data=None, method=None):
    import ssl

    client_ctx = ssl.create_default_context(cafile=cert)
    client_ctx.check_hostname = False  # CN=localhost but we dial 127.0.0.1
    body = urllib.parse.urlencode(data).encode() if data is not None else None
    req = urllib.request.Request(f"https://127.0.0.1:{srv.port}{path}",
                                 data=body, method=method)
    return urllib.request.urlopen(req, timeout=10, context=client_ctx)


def test_tls_roundtrip(tls_server):
    srv, cert = tls_server
    with _tls_request(srv, cert, "/info") as resp:
        info = json.loads(resp.read())
    assert info["name"] == "GSvar server"
    # plain HTTP against the TLS socket must fail, not be served
    with pytest.raises(Exception):  # noqa: B017 — http on https socket
        urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/info", timeout=5)


def test_tls_login_and_protected_endpoint(tls_server):
    srv, cert = tls_server
    with _tls_request(srv, cert, "/login",
                      data={"name": "ahtest", "password": "secret"}) as resp:
        token = resp.read().decode()
    assert len(token) == 40
    with _tls_request(srv, cert, f"/static/hello.txt?token={token}") as resp:
        assert resp.read() == b"tls-content"


def test_every_user_token_endpoint_rejects_missing_and_bogus_token(server):
    """Per-endpoint AuthType enforcement: every USER_TOKEN endpoint must
    reject requests without a token and with an unknown token
    (EndpointManager token checks in the reference)."""
    from ngsbits_tpu.rest.endpoints import AuthType

    protected = [ep for ep in server.endpoints.endpoints()
                 if ep.auth_type == AuthType.USER_TOKEN]
    assert len(protected) >= 20
    checked = 0
    for ep in protected:
        url = "/" + ep.url
        for q in ("", "?token=deadbeef"):
            try:
                if ep.method == "GET":
                    with _get(server, url + q):
                        pass
                elif ep.method == "POST":
                    data = {"token": "deadbeef"} if q else {}
                    with _post(server, url, data):
                        pass
                else:
                    continue
            except urllib.error.HTTPError as err:
                assert err.code in (400, 401, 403), \
                    f"{ep.method} {url}{q}: {err.code}"
                checked += 1
            else:
                raise AssertionError(
                    f"{ep.method} {url}{q} served without a valid token")
    assert checked >= 40


def test_expired_token_rejected(tmp_path):
    """USER_TOKEN endpoints reject tokens past session_duration
    (SessionManager.is_expired)."""
    root = tmp_path / "root"
    root.mkdir()
    (root / "f.txt").write_bytes(b"x")
    srv = GSvarServer(str(root), users={"ahtest": "secret"},
                      session_duration=1)
    srv.start()
    try:
        with _post(srv, "/login", {"name": "ahtest", "password": "secret"}) as resp:
            token = resp.read().decode()
        # valid right now
        with _get(srv, f"/session?token={token}") as resp:
            assert resp.status == 200
        import time
        time.sleep(1.2)
        with pytest.raises(urllib.error.HTTPError) as err:
            _get(srv, f"/static/f.txt?token={token}")
        assert err.value.code in (401, 403)
    finally:
        srv.stop()


def test_tls_from_settings(tmp_path, monkeypatch):
    """Like the reference: ssl_certificate/ssl_key settings make the server
    TLS without an explicit ssl_context (settings.sh writes these keys)."""
    import subprocess

    cert = tmp_path / "c.pem"
    key = tmp_path / "k.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "1",
         "-subj", "/CN=localhost"],
        check=True, capture_output=True)
    monkeypatch.setenv("NGSBITS_SSL_CERTIFICATE", str(cert))
    monkeypatch.setenv("NGSBITS_SSL_KEY", str(key))
    root = tmp_path / "root"
    root.mkdir()
    srv = GSvarServer(str(root), users={"ahtest": "secret"})
    assert srv.uses_tls
    srv.start()
    try:
        with _tls_request(srv, str(cert), "/info") as resp:
            assert json.loads(resp.read())["name"] == "GSvar server"
    finally:
        srv.stop()
