"""GGUF auto-provisioning workflow (parity: ensure_model_available,
app/core/models/ollama/ollama.py:194-298), driven against a fake
converter + Ollama."""

import asyncio
import hashlib

import pytest

from rag_application_tpu.llm.provision import (GGUFProvisionConfig,
                                               GGUFProvisioner,
                                               ProvisionError)

GGUF = b"GGUF fake-model-bytes"


class FakeResponse:
    def __init__(self, status_code=200, json_data=None, content=b"", text=""):
        self.status_code = status_code
        self._json = json_data
        self.content = content
        self.text = text

    def json(self):
        return self._json

    def raise_for_status(self):
        assert self.status_code == 200


class FakeServices:
    """Converter + Ollama in one fake httpx client."""

    def __init__(self, registered=(), polls_until_done=2, fail_convert=False):
        self.registered = list(registered)
        self.polls = 0
        self.polls_until_done = polls_until_done
        self.fail_convert = fail_convert
        self.blobs = {}
        self.created = []

    def __call__(self):
        return self

    async def __aenter__(self):
        return self

    async def __aexit__(self, *a):
        return False

    def stream(self, method, url, **kw):
        """httpx-style streaming context (the artifact download streams
        to bound memory; see provision.py step 3)."""
        svc = self

        class _Ctx:
            async def __aenter__(ctx):
                resp = await svc.get(url, **kw)

                def aiter_bytes():
                    async def gen():
                        if resp.content:
                            yield resp.content
                    return gen()

                resp.aiter_bytes = aiter_bytes
                return resp

            async def __aexit__(ctx, *a):
                return False

        return _Ctx()

    async def get(self, url, **kw):
        if url.endswith("/api/tags"):
            return FakeResponse(json_data={"models": [
                {"name": f"{m}:latest"} for m in self.registered]})
        if "/status/" in url:
            self.polls += 1
            if self.fail_convert:
                return FakeResponse(json_data={"status": "Failed"})
            if self.polls < self.polls_until_done:
                return FakeResponse(json_data={"status": "Processing"})
            return FakeResponse(json_data={"status": "http://converter/files/t1.gguf"})
        if url.endswith("t1.gguf"):
            return FakeResponse(content=GGUF)
        raise AssertionError(f"unexpected GET {url}")

    async def post(self, url, json=None, content=None, **kw):
        if url.endswith("/convert"):
            assert json["repo_id"] == "org/model"
            return FakeResponse(json_data={"task_id": "t1"})
        if "/api/blobs/" in url:
            digest = url.rsplit("/", 1)[-1]
            assert digest == "sha256:" + hashlib.sha256(content).hexdigest()
            self.blobs[digest] = content
            return FakeResponse(status_code=201)
        if url.endswith("/api/create"):
            assert list(json["files"].values())[0] in self.blobs
            self.created.append(json["model"])
            return FakeResponse()
        raise AssertionError(f"unexpected POST {url}")


def make(services, **cfg_kw):
    cfg = GGUFProvisionConfig(hf_repo="org/model", poll_interval_s=0.0,
                              **cfg_kw)
    return GGUFProvisioner("my-model", cfg, client_factory=services)


def test_already_registered_short_circuits():
    svc = FakeServices(registered=["my-model"])
    assert asyncio.run(make(svc).ensure_model_available()) == "my-model"
    assert svc.created == [] and svc.polls == 0


def test_full_conversion_flow():
    svc = FakeServices()
    assert asyncio.run(make(svc).ensure_model_available()) == "my-model"
    # blob uploaded under its sha256 digest, model registered against it
    digest = "sha256:" + hashlib.sha256(GGUF).hexdigest()
    assert svc.blobs == {digest: GGUF}
    assert svc.created == ["my-model"]
    assert svc.polls >= 2  # observed Processing then the artifact URL


def test_conversion_failure_raises():
    svc = FakeServices(fail_convert=True)
    with pytest.raises(ProvisionError, match="conversion failed"):
        asyncio.run(make(svc).ensure_model_available())


def test_missing_repo_raises():
    svc = FakeServices()
    prov = GGUFProvisioner("my-model", GGUFProvisionConfig(),
                           client_factory=svc)
    with pytest.raises(ProvisionError, match="no hf_repo"):
        asyncio.run(prov.ensure_model_available())


def test_tagged_model_names_match_registry():
    """'llama3:8b' registered as 'llama3:8b' (or with :latest) must not
    re-provision."""
    svc = FakeServices(registered=["my-model:q8"])
    prov = GGUFProvisioner(
        "my-model:q8", GGUFProvisionConfig(hf_repo="org/model",
                                           poll_interval_s=0.0),
        client_factory=svc)
    assert asyncio.run(prov.ensure_model_available()) == "my-model:q8"
    assert svc.created == [] and svc.polls == 0
