"""Network service tests: raw relay, SBS broadcast, HTTP endpoints
(contract: dump1090.c:2246-2767)."""

import socket
import time
import urllib.request

import pytest

from dump1090_tpu.io.net import NetConfig, NetworkServices
from dump1090_tpu.models.decoder import (
    DecoderConfig,
    DecoderStats,
    IcaoCache,
    decode_hex_message,
)
from dump1090_tpu.models.hub import HubConfig, MessageHub
from dump1090_tpu.models.tracker import AircraftTracker


def _free_ports(n):
    socks = [socket.socket() for _ in range(n)]
    for s in socks:
        s.bind(("127.0.0.1", 0))
    ports = [s.getsockname()[1] for s in socks]
    for s in socks:
        s.close()
    return ports


@pytest.fixture
def services():
    ro, ri, http, sbs = _free_ports(4)
    cache, cfg, stats = IcaoCache(), DecoderConfig(), DecoderStats()
    tracker = AircraftTracker()
    hub = MessageHub(
        HubConfig(net=True, raw=True), tracker, stats, out=open("/dev/null", "w")
    )

    def on_raw_line(line):
        mm = decode_hex_message(line, cache, cfg, stats)
        if mm is not None:
            hub.use_message(mm)

    net = NetworkServices(
        NetConfig(ro_port=ro, ri_port=ri, http_port=http, sbs_port=sbs,
                  bind_host="127.0.0.1"),
        on_raw_line=on_raw_line,
        data_json=lambda: '[\n]\n',
        on_http_request=lambda: setattr(stats, "http_requests", stats.http_requests + 1),
        on_sbs_connect=lambda: setattr(stats, "sbs_connections", stats.sbs_connections + 1),
    )
    hub.raw_sink = net.broadcast_raw
    hub.sbs_sink = net.broadcast_sbs
    net.start()
    yield net, (ro, ri, http, sbs), stats
    net.stop()


def test_raw_in_to_raw_out_relay(services):
    net, (ro, ri, http, sbs), stats = services
    out = socket.create_connection(("127.0.0.1", ro), timeout=5)
    out.settimeout(5)
    time.sleep(0.1)
    inp = socket.create_connection(("127.0.0.1", ri), timeout=5)
    inp.sendall(b"*8D4D2023991094AD487C14FC9E3D;\n*garbage;\nnoise\n*5D4D20237A55A6;\n")
    got = b""
    while b"5D4D2023" not in got:
        got += out.recv(4096)
    # valid frames re-broadcast uppercase; garbage silently dropped
    assert got == b"*8D4D2023991094AD487C14FC9E3D;\n*5D4D20237A55A6;\n"
    inp.close()
    out.close()


def test_http_data_json_and_page(services):
    net, (ro, ri, http, sbs), stats = services
    body = urllib.request.urlopen(f"http://127.0.0.1:{http}/data.json", timeout=5)
    assert body.headers["Content-Type"].startswith("application/json")
    assert body.headers["Access-Control-Allow-Origin"] == "*"
    assert body.read() == b"[\n]\n"
    page = urllib.request.urlopen(f"http://127.0.0.1:{http}/anything", timeout=5)
    html = page.read()
    assert b"<html" in html.lower()
    deadline = time.time() + 5  # counter bumps on the server thread
    while stats.http_requests < 2 and time.time() < deadline:
        time.sleep(0.02)
    assert stats.http_requests == 2


def test_sbs_connection_counter(services):
    net, (ro, ri, http, sbs), stats = services
    c = socket.create_connection(("127.0.0.1", sbs), timeout=5)
    deadline = time.time() + 5
    while stats.sbs_connections == 0 and time.time() < deadline:
        time.sleep(0.02)
    assert stats.sbs_connections == 1
    c.close()


def test_hex_input_rejects_like_reference():
    cache, cfg = IcaoCache(), DecoderConfig()
    assert decode_hex_message("  *5d4d20237a55a6;  \n", cache, cfg) is not None
    assert decode_hex_message("5d4d20237a55a6;", cache, cfg) is None   # no '*'
    assert decode_hex_message("*5d4d20237a55a6", cache, cfg) is None   # no ';'
    assert decode_hex_message("*5d4d20237a55a;", cache, cfg) is None   # odd length
    assert decode_hex_message("*zz4d20237a55a6;", cache, cfg) is None  # bad hex
    assert decode_hex_message("*" + "ab" * 15 + ";", cache, cfg) is None  # >14 bytes
    # empty body: reference decodes uninitialized stack memory (C UB); we
    # deterministically decode a zero-filled frame (documented divergence)
    mm = decode_hex_message("*;", cache, cfg)
    assert mm is not None and mm.msgtype == 0


def test_debug_net_lines_reference_wording(capsys):
    """--debug n output parity (dump1090.c:2334-2335, 2345-2346, 2569-2592):
    `Created new client %d` / `Closing client %d` on stdout for every
    service, plus the HTTP request/keep-alive/URL dump."""
    import re

    ro, ri, http, sbs = _free_ports(4)
    net = NetworkServices(
        NetConfig(ro_port=ro, ri_port=ri, http_port=http, sbs_port=sbs,
                  bind_host="127.0.0.1", debug_net=True),
        on_raw_line=lambda line: None,
        data_json=lambda: "[\n]\n",
    )
    net.start()
    try:
        c = socket.create_connection(("127.0.0.1", ri), timeout=5)
        c.sendall(b"*5d4d20237a55a6;\n")
        c.close()
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{http}/data.json", timeout=5)
        assert body.read() == b"[\n]\n"
        deadline = time.time() + 5
        out = ""
        while time.time() < deadline:
            out += capsys.readouterr().out
            if out.count("Closing client") >= 2 and "HTTP requested URL" in out:
                break
            time.sleep(0.02)
    finally:
        net.stop()
    out += capsys.readouterr().out
    # reference wording, with real fd numbers
    assert re.search(r"^Created new client \d+$", out, re.M)
    assert re.search(r"^Closing client \d+$", out, re.M)
    assert "\nHTTP request: GET /data.json" in out
    assert "\nHTTP keep alive: 1\n" in out or "\nHTTP keep alive: 0\n" in out
    assert re.search(r"^HTTP requested URL: /data.json\n$", out, re.M)


def test_stalled_client_dropped_at_buffer_bound(services):
    """Broadcast drop policy pinned (round-2 review weak #6): the reference
    drops a client on any short write (dump1090.c:2372-2375 ->
    modesFreeClient); the asyncio port bounds the write buffer instead and
    drops the client at the NEXT broadcast after it exceeds
    MAX_WRITE_BUFFER.  A stalled reader must be disconnected rather than
    buffering without limit; live clients keep receiving."""
    net, (ro, ri, http, sbs), stats = services

    stalled = socket.create_connection(("127.0.0.1", ro), timeout=5)
    live = socket.create_connection(("127.0.0.1", ro), timeout=5)
    live.settimeout(10)
    time.sleep(0.2)

    # small asyncio-side bound so the test fills it fast
    old = net.MAX_WRITE_BUFFER
    net.MAX_WRITE_BUFFER = 64 * 1024
    try:
        line = "*8d4d2023587f345e35837e2218b2;\n"
        # never read from `stalled`: the kernel socket buffers (~MBs) fill
        # first, then asyncio's user-space write buffer grows past the
        # bound, then the next broadcast drops the client.  Push ~8 MB in
        # big chunks so the queue outruns every kernel buffer.
        for _ in range(800):
            net.broadcast_raw(line * 320)
        deadline = time.time() + 10
        dropped = False
        while time.time() < deadline:
            time.sleep(0.1)
            if not net._raw_clients or all(
                w.transport.is_closing() for w in net._raw_clients
            ) or len(net._raw_clients) < 2:
                dropped = True
                break
        assert dropped, "stalled client was never dropped"
        # the live client still receives subsequent broadcasts
        live_data = b""
        live.setblocking(False)
        deadline = time.time() + 5
        while time.time() < deadline and len(live_data) < len(line):
            net.broadcast_raw(line)
            try:
                live_data += live.recv(65536)
            except BlockingIOError:
                time.sleep(0.05)
        assert line.encode() in live_data or len(live_data) >= len(line)
    finally:
        net.MAX_WRITE_BUFFER = old
        stalled.close()
        live.close()


def test_broadcast_under_client_churn(services):
    """Race/stress: the decode thread broadcasts continuously while client
    threads connect, read a little, and disconnect (some without reading —
    the buffer-bound drop path).  The server must survive with no
    exceptions and still serve a fresh client correctly afterwards
    (reference analogue: modesSendAllClients vs modesAcceptClients /
    modesFreeClient churn, dump1090.c:2246-2412)."""
    import threading

    net, (ro, ri, http, sbs), stats = services
    stop = threading.Event()
    errors = []

    def churn(read_some):
        try:
            while not stop.is_set():
                with socket.create_connection(("127.0.0.1", ro), 2) as s:
                    if read_some:
                        s.settimeout(0.2)
                        try:
                            s.recv(4096)
                        except socket.timeout:
                            pass
                # else: connect-and-slam (never reads a byte)
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [
        threading.Thread(target=churn, args=(i % 2 == 0,), daemon=True)
        for i in range(8)
    ]
    for t in threads:
        t.start()
    line = "*8f4d2023587f345e35837e2218b2;\n"
    t_end = time.time() + 3.0
    n = 0
    while time.time() < t_end:
        net.broadcast_raw(line)
        n += 1
        if n % 50 == 0:
            time.sleep(0.005)
    stop.set()
    for t in threads:
        t.join(timeout=5)
    assert not errors
    # the hub still works: a fresh client sees a subsequent broadcast
    with socket.create_connection(("127.0.0.1", ro), 2) as s:
        time.sleep(0.1)
        net.broadcast_raw(line)
        s.settimeout(2)
        got = s.recv(4096)
    assert line.encode().strip() in got


def test_http_under_client_churn(services):
    """Parallel keep-alive HTTP clients plus connect-and-slam sockets must
    not wedge the server; it still answers correctly afterwards
    (reference analogue: the HTTP client handling inside the same select
    loop, dump1090.c:2593-2767)."""
    import threading

    net, (ro, ri, http, sbs), stats = services
    errors = []

    def fetch_loop():
        try:
            for _ in range(10):
                body = urllib.request.urlopen(
                    f"http://127.0.0.1:{http}/data.json", timeout=5
                ).read()
                assert body.startswith(b"[")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def slam_loop():
        try:
            for _ in range(20):
                with socket.create_connection(("127.0.0.1", http), 2) as s:
                    s.send(b"GET /data.json HTTP/1.1\r\n")  # incomplete
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=fetch_loop) for _ in range(6)]
    threads += [threading.Thread(target=slam_loop) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errors
    body = urllib.request.urlopen(
        f"http://127.0.0.1:{http}/data.json", timeout=5
    ).read()
    assert body == b"[\n]\n"


def test_oversized_garbage_line_keeps_client(services):
    """A raw-input client that sends a huge unterminated garbage blob must
    have the garbage discarded and STAY connected — the reference's
    full-buffer reset (dump1090.c:2427-2433) — so valid messages after the
    junk still decode and relay."""
    net, (ro, ri, http, sbs), stats = services
    with socket.create_connection(("127.0.0.1", ro), 2) as out_s:
        time.sleep(0.1)
        with socket.create_connection(("127.0.0.1", ri), 2) as in_s:
            in_s.sendall(b"Z" * 200_000)  # no newline: spans stream limit
            time.sleep(0.2)
            in_s.sendall(b"\n*8f4d2023587f345e35837e2218b2;\n")
            out_s.settimeout(3)
            got = out_s.recv(4096)
    assert b"*8F4D2023587F345E35837E2218B2;" in got


def test_buffer_reset_prefix_discard_matches_reference(services):
    """The 1 KiB client-buffer reset discards the accumulated PREFIX, not the
    whole pending line (dump1090.c:2708-2714): a valid `*hex;` following
    exactly 2048 unterminated junk bytes survives (junk consumed by two
    resets), while one following 1000 junk bytes is destroyed (the reset
    fires mid-message).  Both verified live against the reference binary."""
    msg = b"*8f4d2023587f345e35837e2218b2;"
    sentinel = b"*02e197b00179c3;\n"  # DF0 brute-force AP accept (cached)
    net, (ro, ri, http, sbs), stats = services

    def run(junk_len):
        with socket.create_connection(("127.0.0.1", ro), 2) as out_s:
            time.sleep(0.1)
            with socket.create_connection(("127.0.0.1", ri), 2) as in_s:
                in_s.sendall(b"Z" * junk_len + msg + b"\n")
                in_s.sendall(msg + b"\n")  # always-decodable marker
                out_s.settimeout(3)
                got = b""
                while got.count(b"*8F4D2023587F345E35837E2218B2;") < 1:
                    got += out_s.recv(4096)
                time.sleep(0.2)
                out_s.setblocking(False)
                try:
                    got += out_s.recv(65536)
                except OSError:
                    pass
        return got.count(b"*8F4D2023587F345E35837E2218B2;")

    assert run(2048) == 2  # junk fully consumed by resets: both copies decode
    assert run(1000) == 1  # reset fired mid-message: only the marker decodes


def test_nul_byte_poisons_framing_until_reset(services):
    """An embedded NUL byte hides every later '\\n' from the reference's
    strstr() line framing (dump1090.c:2708-2714 operates on a C string), so
    valid messages AFTER a NUL on the wire are swallowed until the 1 KiB
    full-buffer reset clears the poisoned accumulator.  Lines completed
    BEFORE the NUL still decode.  Verified live against the reference
    binary (`*hex;\\0junk\\n` stalls it until 1024 bytes pile up)."""
    msg = b"*8f4d2023587f345e35837e2218b2;"
    out_msg = b"*8F4D2023587F345E35837E2218B2;"
    net, (ro, ri, http, sbs), stats = services

    def drain(out_s, want, timeout=3.0):
        out_s.settimeout(timeout)
        got = b""
        try:
            while got.count(out_msg) < want:
                got += out_s.recv(4096)
        except OSError:
            pass
        return got

    with socket.create_connection(("127.0.0.1", ro), 2) as out_s:
        time.sleep(0.1)
        with socket.create_connection(("127.0.0.1", ri), 2) as in_s:
            # A line terminated BEFORE the NUL frames normally; the NUL
            # then poisons the remainder: the second copy never decodes
            # even though its '\n' is on the wire.
            in_s.sendall(msg + b"\n\x00junk\n" + msg + b"\n")
            got = drain(out_s, want=2, timeout=1.5)
            assert got.count(out_msg) == 1
            # Pad the accumulator to 1024 bytes: the full-buffer reset
            # discards the poisoned bytes and framing resumes.
            in_s.sendall(b" " * 1024 + msg + b"\n")
            got += drain(out_s, want=2)
    assert got.count(out_msg) == 2


def test_debug_n_http_log_wording(capsys):
    """--debug n stdout for one HTTP keep-alive request, pinned byte-exact
    after fd canonicalization (print sites dump1090.c:2334,2345,2569-2570,
    2590-2592,2638-2639; the request dump excludes the \r\n\r\n separator
    because the reference NUL-terminates the buffer there, :2692).  The
    live cross-decoder differential is tools/netdebug_diff.py."""
    import re

    ro, ri, http, sbs = _free_ports(4)
    net = NetworkServices(
        NetConfig(ro_port=ro, ri_port=ri, http_port=http, sbs_port=sbs,
                  bind_host="127.0.0.1", debug_net=True),
        on_raw_line=lambda line: None,
        data_json=lambda: "[\n]\n",
    )
    net.start()
    try:
        with socket.create_connection(("127.0.0.1", http), 5) as s:
            s.settimeout(5)
            s.sendall(b"GET /data.json HTTP/1.1\r\nHost: t\r\n\r\n")
            buf = b""
            while b"[\n]\n" not in buf:
                buf += s.recv(4096)
    finally:
        # the close log fires when the server's read sees EOF; give the
        # loop a beat before tearing it down
        time.sleep(0.3)
        net.stop()
    out = capsys.readouterr().out
    out = re.sub(r"client \d+", "client N", out)
    assert out == (
        "Created new client N\n"
        "\nHTTP request: GET /data.json HTTP/1.1\r\nHost: t\n"
        "\nHTTP keep alive: 1\n"
        "HTTP requested URL: /data.json\n\n"
        "HTTP Reply header:\n"
        "HTTP/1.1 200 OK\r\n"
        "Server: Dump1090\r\n"
        "Content-Type: application/json;charset=utf-8\r\n"
        "Connection: keep-alive\r\n"
        "Content-Length: 4\r\n"
        "Access-Control-Allow-Origin: *\r\n\r\n"
        "Closing client N\n"
    )
