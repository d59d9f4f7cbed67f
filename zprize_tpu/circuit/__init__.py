from .composer import StandardComposer
