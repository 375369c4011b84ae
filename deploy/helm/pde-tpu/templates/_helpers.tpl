{{/* Common names and labels */}}
{{- define "pde-tpu.name" -}}
{{- .Chart.Name | trunc 63 | trimSuffix "-" -}}
{{- end -}}

{{- define "pde-tpu.fullname" -}}
{{- printf "%s-%s" .Release.Name (include "pde-tpu.name" .) | trunc 63 | trimSuffix "-" -}}
{{- end -}}

{{- define "pde-tpu.labels" -}}
app.kubernetes.io/name: {{ include "pde-tpu.name" . }}
app.kubernetes.io/instance: {{ .Release.Name }}
app.kubernetes.io/version: {{ .Chart.AppVersion }}
app.kubernetes.io/managed-by: {{ .Release.Service }}
{{- end -}}

{{- define "pde-tpu.componentLabels" -}}
{{ include "pde-tpu.labels" .root }}
app.kubernetes.io/component: {{ .component }}
{{- end -}}
