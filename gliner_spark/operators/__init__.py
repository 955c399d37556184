from .ner import extract_entities, ENTITY_SCHEMA  # noqa: F401
