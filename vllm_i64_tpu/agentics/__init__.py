"""Agentics: ReAct agent over the server's own OpenAI API
(ref: vllm_i64/agentics/)."""

from .agent import Agent
from .client import ChatMessage, Client
from .orchestrator import Orchestrator, TaskResult
from .tools import Tool, execute_tool_call, get_tools, tools_to_openai

__all__ = ["Agent", "Client", "ChatMessage", "Orchestrator", "TaskResult",
           "Tool", "get_tools", "tools_to_openai", "execute_tool_call"]
