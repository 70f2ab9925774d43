from anorag_tpu.validators.final_answer_validator import validate_final_answer
from anorag_tpu.validators.note_validator import NOTE_SCHEMA, validate_note

__all__ = ["validate_final_answer", "validate_note", "NOTE_SCHEMA"]
