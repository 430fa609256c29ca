// Frontend logic: wires the control panel to the JSON API and the viewers.
"use strict";

const viewerA = new MeshViewer(document.getElementById("canvasA"));
const viewerB = new MeshViewer(document.getElementById("canvasB"));
let INFO = null;
let PCA = null;

const $ = (id) => document.getElementById(id);
const status = (msg) => { $("status").textContent = msg; };

async function api(path, body) {
  const r = await fetch(path, { method: "POST", headers: { "Content-Type": "application/json" }, body: JSON.stringify(body || {}) });
  const j = await r.json();
  if (j.error) { status("error: " + j.error); throw new Error(j.error); }
  return j;
}

function showMesh(viewer, m) {
  viewer.setMesh(new Float32Array(m.vertices), new Int32Array(m.faces), new Float32Array(m.colors));
}

function coloring() { return $("coloring").value; }
function selI() { return parseInt($("selI").value); }
function selJ() { return parseInt($("selJ").value); }

async function refresh() {
  const i = selI();
  const [ref, rec] = await Promise.all([
    api("/api/mesh", { i, which: "reference", coloring: "none" }),
    api("/api/mesh", { i, which: "recon", coloring: coloring() }),
  ]);
  $("paneTitleA").textContent = `reference — ${INFO.names[i]}`;
  $("paneTitleB").textContent = `reconstruction — ${INFO.names[i]}`;
  showMesh(viewerA, ref);
  showMesh(viewerB, rec);
}

async function init() {
  try {
    INFO = await api("/api/info", {});
  } catch (e) {
    status("no model loaded — start the server with --model/--logDir (or --synthetic), or POST /api/load");
    return;
  }
  $("modelInfo").textContent =
    `${INFO.is_vae ? "VAE" : "AE"} epoch ${INFO.epoch} — ${INFO.n} meshes, ` +
    `latent ${INFO.latent_shape.join("×")}`;
  for (const sel of ["selI", "selJ", "arithJ", "arithK"]) {
    const el = $(sel);
    el.innerHTML = "";
    INFO.names.forEach((n, k) => {
      const o = document.createElement("option");
      o.value = k; o.textContent = `${k}: ${n}`;
      el.appendChild(o);
    });
  }
  $("selJ").value = Math.min(1, INFO.n - 1);
  $("arithJ").value = Math.min(1, INFO.n - 1);
  $("arithK").value = Math.min(2, INFO.n - 1);
  if (!INFO.is_vae) $("fsRegen").style.display = "none";
  // patch checkboxes
  const pb = $("patchBoxes");
  pb.innerHTML = "";
  for (let c = 0; c < 5; c++) {
    const l = document.createElement("label");
    const cb = document.createElement("input");
    cb.type = "checkbox"; cb.dataset.chart = c;
    l.appendChild(cb); l.appendChild(document.createTextNode(" " + c));
    pb.appendChild(l);
  }
  await refresh();
  await drawPCA();
  status("ready");
}

async function drawPCA() {
  PCA = await api("/api/pca", {});
  const cv = $("pcaCanvas"), ctx = cv.getContext("2d");
  ctx.clearRect(0, 0, cv.width, cv.height);
  const pts = PCA.points;
  const xs = pts.map(p => p[0]), ys = pts.map(p => p[1]);
  const xmin = Math.min(...xs), xmax = Math.max(...xs);
  const ymin = Math.min(...ys), ymax = Math.max(...ys);
  const classes = [...new Set(PCA.classes)];
  const palette = ["#d45e00", "#009e73", "#56b4e9", "#f0e442", "#cc79a7", "#0072b2", "#e69f00"];
  PCA._screen = pts.map((p, k) => {
    const x = 15 + (p[0] - xmin) / (xmax - xmin + 1e-9) * (cv.width - 30);
    const y = 15 + (p[1] - ymin) / (ymax - ymin + 1e-9) * (cv.height - 30);
    ctx.fillStyle = palette[classes.indexOf(PCA.classes[k]) % palette.length];
    ctx.beginPath(); ctx.arc(x, y, 4, 0, 6.3); ctx.fill();
    return [x, y];
  });
  cv.onclick = async (e) => {
    const r = cv.getBoundingClientRect();
    const mx = e.clientX - r.left, my = e.clientY - r.top;
    // invert to PCA plane (z=component 3 of nearest screen point)
    let best = 0, bd = 1e9;
    PCA._screen.forEach(([x, y], k) => {
      const d = (x - mx) ** 2 + (y - my) ** 2;
      if (d < bd) { bd = d; best = k; }
    });
    const px = xmin + (mx - 15) / (cv.width - 30) * (xmax - xmin);
    const py = ymin + (my - 15) / (cv.height - 30) * (ymax - ymin);
    const m = await api("/api/pca_decode", { p: [px, py, pts[best][2]], coloring: coloring() });
    $("paneTitleB").textContent = `PCA-NN decode — ${m.name}`;
    showMesh(viewerB, m);
    status(`decoded nearest latent: ${m.name}`);
  };
}

// ---- control wiring ----
$("btnShow").onclick = refresh;
$("coloring").onchange = refresh;
$("selI").onchange = refresh;

$("interpT").oninput = async (e) => {
  const t = parseFloat(e.target.value);
  $("interpVal").textContent = `t = ${t}`;
  const m = await api("/api/interpolate", { i: selI(), j: selJ(), t, coloring: coloring() });
  $("paneTitleB").textContent = `interpolation t=${t}`;
  showMesh(viewerB, m);
};

$("btnArith").onclick = async () => {
  const terms = [{ op: "+", i: selI() }, { op: $("arithOp2").value, i: parseInt($("arithJ").value) }];
  if ($("arithOp3").value) terms.push({ op: $("arithOp3").value, i: parseInt($("arithK").value) });
  const m = await api("/api/arithmetic", { terms, coloring: coloring() });
  $("paneTitleB").textContent = "latent arithmetic";
  $("arithNN").textContent = `nearest dataset latent: ${m.nearest.name}`;
  showMesh(viewerB, m);
};

$("chanDelta").oninput = async (e) => {
  const d = parseFloat(e.target.value);
  $("chanVal").textContent = `Δ = ${d}σ`;
  const m = await api("/api/explore", {
    i: selI(), channel: parseInt($("chanIdx").value), delta: d,
    noise: parseFloat($("chanNoise").value || 0), coloring: coloring(),
  });
  $("paneTitleB").textContent = `channel ${$("chanIdx").value} shifted ${d}σ`;
  showMesh(viewerB, m);
};

$("regenK").oninput = (e) => { $("regenVal").textContent = `k = ${e.target.value}`; };
$("btnRegen").onclick = async () => {
  const m = await api("/api/regenerate", {
    i: selI(), k: parseFloat($("regenK").value),
    seed: Math.floor(Math.random() * 1e6), coloring: coloring(),
  });
  $("paneTitleB").textContent = "re-generation";
  showMesh(viewerB, m);
};

$("btnPatch").onclick = async () => {
  const patches = [...document.querySelectorAll("#patchBoxes input:checked")].map(cb => parseInt(cb.dataset.chart));
  const m = await api("/api/patch_combine", { i: selI(), j: selJ(), patches });
  $("paneTitleB").textContent = `patches ${patches.join(",")} from j`;
  showMesh(viewerB, m);
};

async function pairs(farthest) {
  const r = await api("/api/pairs", { k: 5, farthest });
  $("pairsOut").innerHTML = r.pairs.map(p =>
    `<div>${INFO.names[p.i]} ↔ ${INFO.names[p.j]} (d=${p.d.toFixed(3)})</div>`).join("");
}
$("btnPairsC").onclick = () => pairs(false);
$("btnPairsF").onclick = () => pairs(true);

$("btnViewFile").onclick = async () => {
  const m = await api("/api/view_file", { path: $("filePath").value });
  $("paneTitleB").textContent = `file: ${$("filePath").value}`;
  showMesh(viewerB, m);
};

$("btnExport").onclick = async () => {
  const r = await api("/api/export", { i: selI() });
  status("exported: " + r.path);
};

// client-side PNG export of the output pane (kaleido-free figure export)
const pngBtn = document.createElement("button");
pngBtn.textContent = "download output pane .png";
pngBtn.onclick = () => {
  viewerB.draw();  // ensure fresh frame (preserveDrawingBuffer not set)
  const c = document.getElementById("canvasB");
  requestAnimationFrame(() => {
    const a = document.createElement("a");
    a.download = "geniconet_output.png";
    a.href = c.toDataURL("image/png");
    a.click();
  });
};
$("btnExport").after(pngBtn);

init();
