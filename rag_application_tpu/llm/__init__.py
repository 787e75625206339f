from .router import LLMRouter, Provider, ChatMessage, LLMResponse, StubLLM

__all__ = ["LLMRouter", "Provider", "ChatMessage", "LLMResponse", "StubLLM"]
