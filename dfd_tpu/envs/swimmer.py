"""JAX-native multi-link planar swimmer — HalfCheetah-class continuous
control (~16-dim obs, 6 torque actions) without a C physics engine.

The BASELINE config family [2] targets MuJoCo locomotion (reference
utils/init_helper.py:19-30 routes Box spaces to MujocoPolicy); the MuJoCo
engine is host-side C and cannot be traced into XLA.  This env supplies the
same *learning problem shape* — high-dimensional continuous control where
reward requires coordinating many actuators — as a pure-function `JaxEnv`,
so the whole population rolls out on device.

Physics: an ``n_links`` rigid chain in a viscous planar fluid (the classic
swimmer task, contact-free).  The dynamics are derived from the Lagrangian
*by autodiff at trace time* rather than hand-derived equations:

  - kinematics ``q -> (link centers, link angles)`` is written once;
  - the mass matrix ``M(q) = sum_i m J_ci^T J_ci + I J_phi^T J_phi`` and the
    Coriolis terms come from ``jax.jacfwd`` / ``jax.jvp`` of that kinematics;
  - anisotropic resistive drag (c_normal >> c_tangent) makes undulation
    propel the body — the standard swimmer locomotion mechanism.

Generalized coordinates ``q = [x, y, theta0, alpha_1..alpha_{n-1}]`` (nose
position, heading, relative joint angles).  Actions are joint torques in
[-1, 1].  Reward is MuJoCo-style: forward velocity minus a control cost.
Observations mirror the MuJoCo swimmer convention (qpos minus the root x/y,
then all velocities): ``[theta0, alphas, qdot]``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dfd_tpu.envs.base import JaxEnv


class SwimmerState(NamedTuple):
    q: jnp.ndarray      # [3 + n_joints] generalized coordinates
    qdot: jnp.ndarray   # [3 + n_joints] generalized velocities
    t: jnp.ndarray      # scalar int32


class SwimmerEnv(JaxEnv):
    def __init__(
        self,
        n_links: int = 7,
        link_length: float = 0.25,
        link_mass: float = 1.0,
        dt: float = 0.01,
        frame_skip: int = 4,
        torque_scale: float = 2.0,
        joint_damping: float = 0.3,
        joint_stiffness: float = 2.0,
        drag_tangent: float = 0.1,
        drag_normal: float = 6.0,
        drag_rot: float = 0.02,
        ctrl_cost: float = 1e-3,
        max_steps: int = 200,
    ):
        self.n_links = int(n_links)
        self.n_joints = self.n_links - 1
        self.L = float(link_length)
        self.m = float(link_mass)
        self.I = self.m * self.L ** 2 / 12.0
        self.dt = float(dt)
        self.frame_skip = int(frame_skip)
        self.torque_scale = float(torque_scale)
        self.joint_damping = float(joint_damping)
        self.joint_stiffness = float(joint_stiffness)
        self.c_t = float(drag_tangent)
        self.c_n = float(drag_normal)
        self.c_r = float(drag_rot)
        self.ctrl_cost = float(ctrl_cost)
        self.max_episode_steps = int(max_steps)

        self.ndof = 3 + self.n_joints
        self.action_dim = self.n_joints
        # obs: theta0 + joint angles + all velocities (MuJoCo swimmer drops
        # the root x/y position from qpos)
        self.obs_shape = (1 + self.n_joints + self.ndof,)

    # -- kinematics (the single source of truth for the dynamics) -----------------

    def _kinematics(self, q):
        """q -> (link center positions [n,2], link angles [n])."""
        x, y, theta0 = q[0], q[1], q[2]
        phis = theta0 + jnp.concatenate([jnp.zeros(1), jnp.cumsum(q[3:])])  # [n]
        d = self.L * jnp.stack([jnp.cos(phis), jnp.sin(phis)], axis=-1)     # [n,2]
        joints = jnp.concatenate([jnp.stack([x, y])[None], d[:-1]], axis=0)
        joints = jnp.cumsum(joints, axis=0)                                  # [n,2] link heads
        centers = joints + 0.5 * d
        return centers, phis

    def _terms(self, q, qdot):
        """Dynamics terms at (q, qdot): mass matrix M, generalized drag
        matrix D (all velocity-proportional forces: Q_visc = -D qdot), and
        the Coriolis bias ``dT/dq - Mdot qdot``."""
        m, I = self.m, self.I
        n = self.n_links

        def stacked(qq):
            centers, phis = self._kinematics(qq)
            return jnp.concatenate([centers.reshape(-1), phis])

        def Mq(qq):
            Jq = jax.jacfwd(stacked)(qq)
            Jcq = Jq[: 2 * n].reshape(n, 2, self.ndof)
            Jpq = Jq[2 * n :]
            return m * jnp.einsum("nij,nik->jk", Jcq, Jcq) + I * Jpq.T @ Jpq

        J = jax.jacfwd(stacked)(q)
        Jc = J[: 2 * n].reshape(n, 2, self.ndof)
        Jphi = J[2 * n :]
        M = m * jnp.einsum("nij,nik->jk", Jc, Jc) + I * Jphi.T @ Jphi

        # Coriolis pieces via autodiff:
        #   Mdot qdot = directional derivative of M along qdot, times qdot
        #   dT/dq     = 1/2 d/dq (qdot^T M(q) qdot)
        _, Mdot = jax.jvp(Mq, (q,), (qdot,))
        kinetic = lambda qq: 0.5 * qdot @ Mq(qq) @ qdot
        bias = jax.grad(kinetic)(q) - Mdot @ qdot

        # anisotropic resistive drag per link: force at the center
        # -(c_t t t^T + c_n n n^T) v  plus rotational drag -c_r omega; plus
        # joint damping.  All linear in qdot -> one SPD matrix D.
        _, phis = self._kinematics(q)
        tang = jnp.stack([jnp.cos(phis), jnp.sin(phis)], axis=-1)  # [n,2]
        norm = jnp.stack([-jnp.sin(phis), jnp.cos(phis)], axis=-1)
        A = self.c_t * jnp.einsum("ni,nj->nij", tang, tang) + self.c_n * jnp.einsum(
            "ni,nj->nij", norm, norm
        )  # [n,2,2]
        D = jnp.einsum("nia,nab,njb->ij", jnp.swapaxes(Jc, 1, 2), A, jnp.swapaxes(Jc, 1, 2))
        D = D + self.c_r * Jphi.T @ Jphi
        damp = jnp.concatenate([jnp.zeros(3), jnp.full(self.n_joints, self.joint_damping)])
        D = D + jnp.diag(damp)
        return M, D, bias

    def _com_x(self, q):
        centers, _ = self._kinematics(q)
        return centers[:, 0].mean()

    # -- JaxEnv interface ----------------------------------------------------------

    def _obs(self, state: SwimmerState) -> jnp.ndarray:
        return jnp.concatenate([state.q[2:], state.qdot]).astype(jnp.float32)

    def reset(self, key) -> Tuple[SwimmerState, jnp.ndarray]:
        kq, kv = jax.random.split(key)
        q = jnp.zeros(self.ndof).at[2:].set(
            jax.random.uniform(kq, (self.ndof - 2,), minval=-0.1, maxval=0.1)
        )
        qdot = jax.random.uniform(kv, (self.ndof,), minval=-0.1, maxval=0.1)
        state = SwimmerState(q=q, qdot=qdot, t=jnp.asarray(0, jnp.int32))
        return state, self._obs(state)

    def step(self, state: SwimmerState, action):
        tau = self.torque_scale * jnp.clip(jnp.asarray(action, jnp.float32), -1.0, 1.0)

        def substep(carry, _):
            q, qdot = carry
            M, D, bias = self._terms(q, qdot)
            # joint stiffness restores the chain to straight (bounded gaits)
            Q = jnp.concatenate([jnp.zeros(3), tau - self.joint_stiffness * q[3:]])
            # semi-implicit Euler with IMPLICIT treatment of the
            # velocity-proportional drag: (M + dt D) v' = M v + dt (Q + bias)
            # — unconditionally stable however large the drag coefficients,
            # where explicit drag integration blows up at speed.
            qdot = jnp.linalg.solve(
                M + self.dt * D + 1e-9 * jnp.eye(self.ndof),
                M @ qdot + self.dt * (Q + bias),
            )
            q = q + self.dt * qdot
            return (q, qdot), ()

        (q, qdot), _ = jax.lax.scan(substep, (state.q, state.qdot), None, length=self.frame_skip)

        # forward reward on the center of mass (the nose x alone is dominated
        # by undulation noise; the COM isolates net locomotion)
        dx = self._com_x(q) - self._com_x(state.q)
        reward = dx / (self.dt * self.frame_skip) - self.ctrl_cost * jnp.sum(tau ** 2)

        t = state.t + 1
        done = t >= self.max_episode_steps
        new_state = SwimmerState(q=q, qdot=qdot, t=t)
        return new_state, self._obs(new_state), reward.astype(jnp.float32), done
