from .mont import FR, FQ, FieldCtx
