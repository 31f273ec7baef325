"""Multi-agent orchestrator: N concurrent worker agents over a task queue
(ref: vllm_i64/agentics/orchestrator.py)."""

from __future__ import annotations

import asyncio
import logging
import time
from dataclasses import dataclass, field
from enum import IntEnum
from typing import Dict, List, Optional

from .agent import Agent
from .client import Client

logger = logging.getLogger("vllm_i64_tpu.agentics")


class TaskStatus(IntEnum):
    PENDING = 0
    RUNNING = 1
    DONE = 2
    FAILED = 3


@dataclass
class AgentTask:
    task_id: int
    prompt: str
    status: TaskStatus = TaskStatus.PENDING


@dataclass
class TaskResult:
    task_id: int
    prompt: str
    answer: str
    status: TaskStatus
    elapsed_s: float = 0.0
    agent_id: int = -1


class Orchestrator:
    def __init__(self, base_url: str = "http://localhost:8000",
                 api_key: Optional[str] = None, num_agents: int = 2,
                 allow_shell: bool = False, max_steps: int = 10,
                 verbose: bool = False):
        self.base_url = base_url
        self.api_key = api_key
        self.num_agents = max(1, num_agents)
        self.allow_shell = allow_shell
        self.max_steps = max_steps
        self.verbose = verbose
        self._tasks: List[AgentTask] = []
        self._results: Dict[int, TaskResult] = {}
        self._next_id = 0

    def submit(self, prompt: str) -> int:
        tid = self._next_id
        self._next_id += 1
        self._tasks.append(AgentTask(task_id=tid, prompt=prompt))
        return tid

    def submit_batch(self, prompts: List[str]) -> List[int]:
        return [self.submit(p) for p in prompts]

    def _make_agent(self, agent_id: int) -> Agent:
        return Agent(
            client=Client(base_url=self.base_url, api_key=self.api_key),
            allow_shell=self.allow_shell,
            max_steps=self.max_steps,
            verbose=self.verbose,
        )

    async def _worker(self, agent_id: int,
                      queue: "asyncio.Queue[AgentTask]") -> None:
        agent = self._make_agent(agent_id)
        while True:
            try:
                task = queue.get_nowait()
            except asyncio.QueueEmpty:
                return
            task.status = TaskStatus.RUNNING
            t0 = time.perf_counter()
            try:
                answer = await agent.arun(task.prompt)
                task.status = TaskStatus.DONE
            except Exception as exc:
                answer = f"error: {exc}"
                task.status = TaskStatus.FAILED
            self._results[task.task_id] = TaskResult(
                task_id=task.task_id, prompt=task.prompt, answer=answer,
                status=task.status,
                elapsed_s=round(time.perf_counter() - t0, 2),
                agent_id=agent_id)

    async def run(self) -> List[TaskResult]:
        queue: asyncio.Queue = asyncio.Queue()
        for t in self._tasks:
            if t.status == TaskStatus.PENDING:
                queue.put_nowait(t)
        await asyncio.gather(*[
            self._worker(i, queue) for i in range(self.num_agents)
        ])
        return [self._results[t.task_id] for t in self._tasks
                if t.task_id in self._results]

    def run_sync(self) -> List[TaskResult]:
        return asyncio.run(self.run())

    def clear(self) -> None:
        self._tasks.clear()
        self._results.clear()

    @property
    def pending_count(self) -> int:
        return sum(1 for t in self._tasks if t.status == TaskStatus.PENDING)

    @property
    def completed_count(self) -> int:
        return sum(1 for t in self._tasks if t.status == TaskStatus.DONE)
