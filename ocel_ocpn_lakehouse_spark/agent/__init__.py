from .intent import classify_intent, extract_parameters, ask

__all__ = ["classify_intent", "extract_parameters", "ask"]
