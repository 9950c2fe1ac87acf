"""Agent orchestration layer (reference agents/, SURVEY.md §2.4).

In-process task orchestration: a coordinator drives analysis -> enhancement
-> quality assessment workflows over specialized agents, connected by an
asyncio message broker with heartbeat-based registry.
"""

from .task_spec import (  # noqa: F401
    Priority,
    ProcessingConstraints,
    Quality,
    TaskSpecification,
    TaskType,
    VideoSpecs,
)
from .base import AgentCapabilities, BaseAgent, ProcessingResult  # noqa: F401
from .enhancer import VideoEnhancementAgent  # noqa: F401
from .analyzer import VideoAnalyzerAgent  # noqa: F401
from .quality import QualityAssessmentAgent  # noqa: F401
from .coordinator import CoordinatorAgent  # noqa: F401
from .communication import (  # noqa: F401
    AgentCommunicationSystem,
    AgentRegistry,
    MessageBroker,
)
